"""``hf-hub:`` model-name resolution against the local HF cache
(ref: src/open_clip/factory.py:251-320 — config + weights from one
snapshot; offline here, so the cache IS the hub)."""
import json

import numpy as np
import pytest


def _make_snapshot(tmp_path, repo="acme/tiny-clip"):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp  # noqa: F401

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.models.convert import jax_to_torch_state_dict

    src = create_model("ViT-Test", precision="fp32", seed=3)
    snap = (tmp_path / "hub" / ("models--" + repo.replace("/", "--"))
            / "snapshots" / "deadbeef")
    snap.mkdir(parents=True)
    cfg = {
        "model_cfg": json.loads(
            (  # reuse the built-in ViT-Test architecture json
                __import__("pathlib").Path(
                    "spatial_clip_tpu/models/model_configs/ViT-Test.json"
                ).read_text()
            )
        ),
        "preprocess_cfg": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    }
    (snap / "open_clip_config.json").write_text(json.dumps(cfg))
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in jax_to_torch_state_dict(src.params).items()}
    torch.save(sd, snap / "open_clip_pytorch_model.bin")
    return src, repo


def test_hf_hub_scheme_resolves_config_and_weights(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from spatial_clip_tpu import create_model

    src, repo = _make_snapshot(tmp_path)
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(tmp_path / "hub"))
    bundle = create_model(f"hf-hub:{repo}", precision="fp32", seed=0)

    # the snapshot's preprocess_cfg must be honored (not OpenAI defaults)
    assert bundle.preprocess_cfg.mean == (0.5, 0.5, 0.5)
    assert bundle.preprocess_cfg.std == (0.5, 0.5, 0.5)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    txt = jnp.asarray(rng.integers(0, 512, (2, 16)), jnp.int32)
    a = src.model.apply({"params": src.params}, img, txt)
    b = bundle.model.apply({"params": bundle.params}, img, txt)
    np.testing.assert_allclose(
        np.asarray(a["image_features"]), np.asarray(b["image_features"]),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a["text_features"]), np.asarray(b["text_features"]),
        atol=2e-5)


def test_hf_hub_config_only_snapshot_refuses_random_init(tmp_path, monkeypatch):
    """A snapshot with a config but no weight file must raise, never hand
    back randomly initialized params (ref loads weights or fails loudly)."""
    from spatial_clip_tpu import create_model

    _, repo = _make_snapshot(tmp_path)
    hub = tmp_path / "hub"
    snap = next((hub / ("models--" + repo.replace("/", "--"))
                 / "snapshots").iterdir())
    (snap / "open_clip_pytorch_model.bin").unlink()
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(hub))
    with pytest.raises(FileNotFoundError, match="weight"):
        create_model(f"hf-hub:{repo}", precision="fp32", seed=0)


def test_hf_hub_cache_env_var_is_honored(tmp_path, monkeypatch):
    """HF_HUB_CACHE (the canonical hub-cache variable) locates snapshots."""
    from spatial_clip_tpu.models.config import hf_cache_snapshot

    _, repo = _make_snapshot(tmp_path)
    monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nonexistent"))
    assert hf_cache_snapshot(repo) is not None


def test_hf_hub_scheme_offline_error_names_the_problem(monkeypatch, tmp_path):
    from spatial_clip_tpu.models.config import load_model_config

    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(tmp_path / "empty"))
    monkeypatch.setenv("HF_HOME", str(tmp_path / "also-empty"))
    with pytest.raises(ValueError, match="hf-hub|cached snapshot"):
        load_model_config("hf-hub:nobody/nothing")
