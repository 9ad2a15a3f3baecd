"""Capability-gated test markers (ref: tests/helpers/run_if.py:28-142)."""
from __future__ import annotations

import importlib.util
import os

import pytest


def _package_available(name: str) -> bool:
    return importlib.util.find_spec(name) is not None


def _tpu_available() -> bool:
    if os.environ.get("SPATIAL_CLIP_TEST_TPU"):
        return True
    return False


class RunIf:
    """``@RunIf(tpu=True)`` / ``@RunIf(min_devices=8)`` skip decorator."""

    def __new__(
        cls,
        tpu: bool = False,
        min_devices: int = 0,
        package: str = "",
        **kwargs,
    ):
        conditions = []
        reasons = []
        if tpu:
            conditions.append(not _tpu_available())
            reasons.append("requires a TPU (set SPATIAL_CLIP_TEST_TPU=1)")
        if min_devices:
            import jax

            conditions.append(len(jax.devices()) < min_devices)
            reasons.append(f"requires >= {min_devices} devices")
        if package:
            conditions.append(not _package_available(package))
            reasons.append(f"requires package '{package}'")
        return pytest.mark.skipif(
            condition=any(conditions), reason=", ".join(reasons) or "unmet condition"
        )
