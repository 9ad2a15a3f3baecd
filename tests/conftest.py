"""Test configuration: force a virtual 8-device CPU mesh.

Mirrors the reference's CPU-simulated DDP strategy (ref:
tests/test_train.py:65-77, configs/trainer/ddp_sim.yaml) — multi-chip
correctness is validated on host-platform virtual devices, per SURVEY.md §4.
"""
import os

# Force CPU unless the caller explicitly opts into on-TPU testing with
# SPATIAL_CLIP_TEST_TPU=1. The environment may pre-import jax (sitecustomize),
# so set both the env vars and the live config before any backend initializes.
if not os.environ.get("SPATIAL_CLIP_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _ensure_native_built():
    """Build the C++ data-loader core so its test doesn't skip.

    ``make test`` already depends on the native target, but the suite is
    also run as bare ``pytest tests/``; build here when a compiler exists
    and fall back silently (the ctypes loader has a pure-Python fallback).
    """
    import shutil
    import subprocess
    from pathlib import Path

    native = Path(__file__).resolve().parents[1] / "native"
    # both libs: the indexer (dependency-free) and the image decoder
    # (best-effort — its make target is '-'-prefixed, so a host without
    # libpng/libjpeg still gets rc=0 and the PIL fallback)
    if ((native / "libspatialclip_native.so").is_file()
            and (native / "libscimagedec.so").is_file()):
        return
    if not shutil.which("make") or not shutil.which("g++"):
        return
    try:
        subprocess.run(
            ["make", "-C", str(native)], check=True,
            capture_output=True, timeout=120)
    except subprocess.CalledProcessError as e:
        # visible signal instead of a silent pure-Python fallback: a
        # compiler/Makefile regression should show up in the test output
        import warnings

        warnings.warn(
            "native build failed (tests fall back to the pure-Python "
            f"loader): {e.stderr.decode(errors='replace')[-500:]}",
            stacklevel=1)
    except Exception as e:  # noqa: BLE001 — e.g. timeout
        import warnings

        warnings.warn(f"native build skipped: {e!r}", stacklevel=1)


_ensure_native_built()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_bundle():
    """A tiny CLIP model shared across tests (1 CPU core: keep it small)."""
    from spatial_clip_tpu import create_model

    return create_model("ViT-Test", precision="fp32", seed=0)
