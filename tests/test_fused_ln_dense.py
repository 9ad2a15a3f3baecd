"""Parity tests for the fused LayerNorm->Dense Pallas kernel
(ops/fused_ln_dense). Interpret mode on CPU; compiled on-TPU parity is
covered by tests/test_tpu_only.py when SPATIAL_CLIP_TEST_TPU=1."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_clip_tpu.ops.fused_ln_dense import (
    fused_ln_dense,
    reference_ln_dense,
)


def _inputs(rng, R, K, N):
    x = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(K,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.normal(size=(K,)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) / np.sqrt(K))
    bias = jnp.asarray(0.1 * rng.normal(size=(N,)).astype(np.float32))
    return x, gamma, beta, kernel, bias


# (rows not a BLOCK_M multiple, small K/N) and (tile-aligned, production-ish)
@pytest.mark.parametrize("R,K,N", [(70, 128, 256), (512, 256, 384)])
def test_forward_parity(rng, R, K, N):
    args = _inputs(rng, R, K, N)
    out = fused_ln_dense(*args, 1e-5, True)
    ref = reference_ln_dense(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_gradient_parity(rng):
    R, K, N = 70, 128, 256
    x, gamma, beta, kernel, bias = _inputs(rng, R, K, N)
    tgt = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32))

    def loss_fused(x, g, b, k, bi):
        return ((fused_ln_dense(x, g, b, k, bi, 1e-5, True) - tgt) ** 2).sum()

    def loss_ref(x, g, b, k, bi):
        return ((reference_ln_dense(x, g, b, k, bi) - tgt) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, kernel, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, kernel, bias)
    for a, b, name in zip(g1, g2, ("dx", "dgamma", "dbeta", "dkernel", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-4, err_msg=name
        )


def test_bf16_forward_close(rng):
    """bf16 compute path stays within bf16 rounding of the fp32 reference."""
    R, K, N = 256, 256, 384
    x, gamma, beta, kernel, bias = _inputs(rng, R, K, N)
    out = fused_ln_dense(x.astype(jnp.bfloat16), gamma, beta, kernel, bias,
                         1e-5, True)
    ref = reference_ln_dense(x, gamma, beta, kernel, bias)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.08
    )


def test_model_level_parity_ln_fused(rng):
    """ln_gemm_impl='pallas' must match the LayerNorm+Dense path exactly,
    with the identical param tree (checkpoints unaffected)."""
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    wide = dict(
        vision_cfg=dict(width=128, heads=2),
        text_cfg=dict(width=128, heads=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0,
                      attn_impl="pallas", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0,
                      attn_impl="pallas", ln_gemm_impl="pallas", **wide)
    assert jax.tree_util.tree_structure(b1.params) == jax.tree_util.tree_structure(
        b2.params
    )
    i1 = np.asarray(b1.encode_image(imgs, normalize=False))
    i2 = np.asarray(b2.encode_image(imgs, params=b1.params, normalize=False))
    t1 = np.asarray(b1.encode_text(texts, normalize=False))
    t2 = np.asarray(b2.encode_text(texts, params=b1.params, normalize=False))
    np.testing.assert_allclose(i2, i1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t2, t1, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_model_level_grads_ln_fused(rng):
    """End-to-end gradients through the fused LN->GEMM custom VJP must match
    the LayerNorm+Dense autodiff path."""
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    wide = dict(
        vision_cfg=dict(width=128, heads=2, layers=2),
        text_cfg=dict(width=128, heads=2, layers=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0,
                      attn_impl="pallas", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0,
                      attn_impl="pallas", ln_gemm_impl="pallas", **wide)

    def loss(bundle):
        def f(params):
            out = bundle.model.apply(
                {"params": params}, jnp.asarray(imgs), jnp.asarray(texts), True
            )
            return (
                out["image_features"].sum() + (out["text_features"] ** 2).sum()
            )
        return jax.grad(f)(b1.params)

    g1 = loss(b1)
    g2 = loss(b2)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(g2)}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat2[ks]), atol=2e-3, rtol=2e-3,
            err_msg=ks,
        )
