"""Parity tests for the fused LayerNorm kernel (ops/fused_ln).

Interpret mode on CPU; compiled parity on TPU via the model-level A/B.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_clip_tpu.ops.fused_ln import fused_layer_norm


def _ref_ln(x, g, b, eps=1e-5):
    xa = x.astype(jnp.float32)
    mean = xa.mean(-1, keepdims=True)
    var = jnp.square(xa - mean).mean(-1, keepdims=True)
    return ((xa - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


@pytest.mark.parametrize("R,D", [(64, 128), (96, 256), (800, 128)])
def test_forward_parity(rng, R, D):
    x = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    g = jnp.asarray(1 + 0.1 * rng.normal(size=(1, D)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=(1, D)).astype(np.float32))
    out = fused_layer_norm(x, g, b, 1e-5, True)
    ref = _ref_ln(x, g[0], b[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradient_parity(rng):
    R, D = 96, 128
    x = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    g = jnp.asarray(1 + 0.1 * rng.normal(size=(1, D)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=(1, D)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))

    def loss(args):
        return ((fused_layer_norm(*args, 1e-5, True) - tgt) ** 2).sum()

    def loss_ref(args):
        x, g, b = args
        return ((_ref_ln(x, g[0], b[0]) - tgt) ** 2).sum()

    gr = jax.grad(loss)((x, g, b))
    gr_ref = jax.grad(loss_ref)((x, g, b))
    for a, r in zip(gr, gr_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-4,
                                   rtol=1e-4)


def test_sharded_rows(rng):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    R, D = 128, 128
    x = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    g = jnp.asarray(1 + 0.1 * rng.normal(size=(1, D)).astype(np.float32))
    b = jnp.zeros((1, D), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def loss(x, g, b):
        return (fused_layer_norm(x, g, b, 1e-5, True) ** 2).sum()

    gx, gg, gb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x_s, g, b)
    ref = jax.grad(
        lambda x, g, b: (_ref_ln(x, g[0], b[0]) ** 2).sum(), argnums=(0, 1, 2)
    )(x, g, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref[0]), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(ref[1]),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ref[2]),
                               atol=2e-3, rtol=1e-4)


def test_model_level_parity_ln_pallas(rng):
    """ln_impl='pallas' must match the default through a whole tower with
    the identical param tree."""
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    wide = dict(
        vision_cfg=dict(width=128, heads=2),
        text_cfg=dict(width=128, heads=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0, ln_impl="fp32", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0, ln_impl="pallas", **wide)
    assert jax.tree_util.tree_structure(b1.params) == jax.tree_util.tree_structure(
        b2.params
    )
    i1 = np.asarray(b1.encode_image(imgs, normalize=False))
    i2 = np.asarray(b2.encode_image(imgs, params=b1.params, normalize=False))
    t1 = np.asarray(b1.encode_text(texts, normalize=False))
    t2 = np.asarray(b2.encode_text(texts, params=b1.params, normalize=False))
    np.testing.assert_allclose(i2, i1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t2, t1, atol=1e-4, rtol=1e-4)
