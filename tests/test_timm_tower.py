"""TimmStyleTower (timm-equivalent vision backbone adapter) tests.

Ref: src/open_clip/timm_model.py:23-145 (TimmModel pool/proj head options),
src/open_clip/model.py:144-160 (timm_* vision_cfg keys).
"""
from __future__ import annotations

import numpy as np
import pytest

from spatial_clip_tpu import create_model, list_models


TINY = dict(
    embed_dim=64,
    vision_cfg=dict(timm_model_name="convnext_pico", image_size=64),
    text_cfg=dict(width=32, heads=2, layers=2, vocab_size=128, context_length=16),
)


@pytest.mark.parametrize(
    "pool,proj",
    [("", "linear"), ("avg", "mlp"), ("abs_attn", "none"), ("rot_attn", "none")],
)
def test_head_variants(rng, pool, proj):
    cfg = dict(TINY)
    cfg["vision_cfg"] = dict(cfg["vision_cfg"], timm_pool=pool, timm_proj=proj)
    b = create_model("convnext_base", precision="fp32", seed=0, **cfg)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(b.encode_image(img, normalize=False))
    assert out.shape == (2, 64)
    assert np.isfinite(out).all()


def test_vit_gap_trunk(rng):
    b = create_model(
        "vit_medium_patch16_gap_256", precision="fp32", seed=0,
        embed_dim=64,
        vision_cfg=dict(
            timm_model_name="vit_medium_patch16_gap_256", image_size=64
        ),
        text_cfg=dict(width=32, heads=2, layers=2, vocab_size=128,
                      context_length=16),
    )
    # shrink the trunk for CPU: pico-size override isn't available for the
    # named vit trunk, so just run the real one on a 64px input (16 tokens)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(b.encode_image(img, normalize=False))
    assert out.shape == (1, 64)


def test_convnext_configs_listed():
    models = list_models()
    for name in ("convnext_base", "convnext_base_w", "convnext_large_d",
                 "convnext_xxlarge", "vit_medium_patch16_gap_256"):
        assert name in models, name


def test_unknown_trunk_raises():
    with pytest.raises(KeyError):
        b = create_model(
            "convnext_base", precision="fp32", seed=0,
            embed_dim=32,
            vision_cfg=dict(timm_model_name="swin_base_nonexistent",
                            image_size=32),
            text_cfg=dict(width=32, heads=2, layers=1, vocab_size=64,
                          context_length=8),
        )


@pytest.mark.slow
def test_full_train_step_with_timm_tower(rng):
    """The adapter must be trainable end-to-end (grads flow, loss finite)."""
    import jax

    from spatial_clip_tpu.losses import make_loss

    b = create_model("convnext_base", precision="fp32", seed=0, **TINY)
    loss_fn = make_loss("clip")
    imgs = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
    texts = rng.integers(0, 128, (4, 16)).astype(np.int32)

    def loss(params):
        out = b.model.apply({"params": params}, imgs, texts)
        losses = loss_fn(
            image_features=out["image_features"],
            text_features=out["text_features"],
            logit_scale=out["logit_scale"],
        )
        return sum(jax.tree_util.tree_leaves(losses))

    val, grads = jax.value_and_grad(loss)(b.params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)


@pytest.mark.parametrize(
    "trunk,pool,proj",
    [
        ("eva_pico_patch16_test", "token", None),
        ("vitamin_pico_test", "", "linear"),
        ("fastvit_pico_test", "avg", None),
        ("swin_pico_test", "avg", "linear"),
        ("vit_pico_patch16_siglip_test", "map", "none"),
    ],
)
def test_new_trunk_families(rng, trunk, pool, proj):
    """EVA (rope+SwiGLU), ViTamin (MBConv hybrid), FastViT (RepMixer),
    Swin (shifted-window MSA) and siglip-MAP trunks construct, run, and
    project to embed_dim (ref: EVA*/ViTamin-*/MobileCLIP-*/PE-Core-*/swin
    model configs via timm_model.py)."""
    b = create_model(
        "convnext_base", precision="fp32", seed=0,
        embed_dim=64,
        vision_cfg=dict(timm_model_name=trunk, image_size=64, timm_pool=pool,
                        timm_proj=proj),
        text_cfg=dict(width=32, heads=2, layers=1, vocab_size=64,
                      context_length=8),
    )
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(b.encode_image(img, normalize=False))
    assert out.shape == (2, 64)
    assert np.isfinite(out).all()


def test_full_config_inventory_resolves():
    """Every shipped model config must resolve and (when timm-based) have a
    registered trunk — the reference's full 138-config surface."""
    from spatial_clip_tpu.models.config import resolve_clip_cfg
    from spatial_clip_tpu.models.timm_model import TRUNKS

    models = list_models()
    assert len(models) >= 138
    for name in models:
        cfg = resolve_clip_cfg(name)
        tm = cfg.vision_cfg.timm_model_name
        if tm:
            assert tm in TRUNKS, f"{name}: trunk {tm} not registered"
