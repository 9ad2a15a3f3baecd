"""Pallas fused spatial-CE kernel: numerical parity vs plain-XLA reference
(interpret mode on CPU; the same kernel compiles for TPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_clip_tpu.ops.fused_contrastive import (
    fused_spatial_ce,
    reference_spatial_ce,
)


def _case(B=48, N=96, D=32, k=4, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    K = rng.normal(size=(N, D)).astype(np.float32)
    K /= np.linalg.norm(K, axis=1, keepdims=True)
    col_ids = rng.permutation(10_000)[:N].astype(np.int32)
    gt = rng.permutation(N)[:B].astype(np.int32)
    nbr = np.where(
        rng.uniform(size=(B, k)) < 0.7,
        col_ids[rng.integers(0, N, (B, k))],
        -1,
    ).astype(np.int32)
    alphas = rng.uniform(0.1, 1.0, (B, k)).astype(np.float32)
    return q, K, col_ids, gt, nbr, alphas


FUSED = functools.partial(fused_spatial_ce, block_m=16, block_n=32, interpret=True)


def test_fused_forward_matches_reference():
    q, K, col_ids, gt, nbr, alphas = _case()
    got = FUSED(
        jnp.asarray(q), jnp.asarray(K), jnp.asarray(col_ids), jnp.asarray(gt),
        jnp.asarray(nbr), jnp.asarray(alphas), jnp.float32(10.0),
    )
    want = reference_spatial_ce(
        jnp.asarray(q), jnp.asarray(K), jnp.asarray(col_ids), jnp.asarray(gt),
        jnp.asarray(nbr), jnp.asarray(alphas), jnp.float32(10.0),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_forward_unpadded_shapes():
    # B, N not multiples of the block sizes -> exercises masking
    q, K, col_ids, gt, nbr, alphas = _case(B=19, N=45, D=32, k=3, seed=1)
    got = FUSED(
        jnp.asarray(q), jnp.asarray(K), jnp.asarray(col_ids), jnp.asarray(gt),
        jnp.asarray(nbr), jnp.asarray(alphas), jnp.float32(7.0),
    )
    want = reference_spatial_ce(
        jnp.asarray(q), jnp.asarray(K), jnp.asarray(col_ids), jnp.asarray(gt),
        jnp.asarray(nbr), jnp.asarray(alphas), jnp.float32(7.0),
    )
    assert got.shape == (19,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_reference():
    q, K, col_ids, gt, nbr, alphas = _case(B=16, N=32, D=16, k=3, seed=2)
    args = (jnp.asarray(col_ids), jnp.asarray(gt), jnp.asarray(nbr), jnp.asarray(alphas))

    def loss_fused(q, K, s):
        return FUSED(q, K, *args, s).mean()

    def loss_ref(q, K, s):
        return reference_spatial_ce(q, K, *args, s).mean()

    gq_f, gk_f, gs_f = jax.grad(loss_fused, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(K), jnp.float32(5.0)
    )
    gq_r, gk_r, gs_r = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(K), jnp.float32(5.0)
    )
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(gs_f), float(gs_r), rtol=1e-4)


def test_spatial_loss_fused_matches_unfused(feats=None):
    from spatial_clip_tpu.losses.contrastive import spatial_loss

    q, K, col_ids, gt, nbr, alphas = _case(B=32, N=32, D=16, k=3, seed=3)
    # symmetric in-batch case: rows == cols (N == B), ids shared
    common = dict(
        image_features=jnp.asarray(q),
        text_features=jnp.asarray(K[:32]),
        logit_scale=jnp.float32(10.0),
        image_tile_ids=jnp.asarray(col_ids[:32]),
        text_tile_ids=jnp.asarray(col_ids[:32]),
        neighbor_tile_ids=jnp.asarray(nbr),
        neighbor_alphas=jnp.asarray(alphas),
        cap_logit_scale=50.0,
    )
    plain = spatial_loss(**common)["contrastive_loss"]
    fused = spatial_loss(**common, use_fused_kernel=True)["contrastive_loss"]
    np.testing.assert_allclose(float(fused), float(plain), rtol=3e-5)


def test_fused_mlp_matches_reference():
    from spatial_clip_tpu.ops.fused_mlp import fused_mlp, reference_mlp

    rng = np.random.default_rng(0)
    R, W, H = 100, 128, 512
    x = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    fc_w = jnp.asarray(rng.normal(size=(W, H)).astype(np.float32) * 0.05)
    fc_b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
    pj_w = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32) * 0.05)
    pj_b = jnp.asarray(rng.normal(size=(W,)).astype(np.float32) * 0.05)
    got = fused_mlp(x, fc_w, fc_b, pj_w, pj_b, block_m=64, block_h=256, interpret=True)
    want = reference_mlp(x, fc_w, fc_b, pj_w, pj_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # gradients
    def lf(x, fw, fb, pw, pb):
        return fused_mlp(x, fw, fb, pw, pb, block_m=64, block_h=256, interpret=True).sum()

    def lr(x, fw, fb, pw, pb):
        return reference_mlp(x, fw, fb, pw, pb).sum()

    gf = jax.grad(lf, argnums=(0, 1, 2, 3, 4))(x, fc_w, fc_b, pj_w, pj_b)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(x, fc_w, fc_b, pj_w, pj_b)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_mlp_impl_pallas_same_params_and_output():
    """mlp_impl='pallas' keeps the identical param tree and matches dense."""
    import jax.numpy as jnp
    from spatial_clip_tpu.models.transformer import MLP
    from flax import linen as nn

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 128)).astype(np.float32))
    dense = MLP(width=128, hidden=512, impl="dense")
    pallas = MLP(width=128, hidden=512, impl="pallas")
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    # identical tree
    params2 = pallas.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
    out_d = dense.apply({"params": params}, x)
    out_p = pallas.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d), rtol=2e-5, atol=2e-5)
