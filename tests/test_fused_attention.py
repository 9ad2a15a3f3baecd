"""Parity tests for the Pallas fused attention kernel (ops/fused_attention).

Interpret mode on CPU; on-TPU compiled parity is covered by
tests/test_tpu_only.py when SPATIAL_CLIP_TEST_TPU=1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_clip_tpu.ops.fused_attention import (
    fused_attention,
    reference_attention,
)


def _rand_qkv(rng, B, L, D):
    return jnp.asarray(rng.normal(size=(B, L, 3 * D)).astype(np.float32))


def test_supported_geometry():
    from spatial_clip_tpu.ops.fused_attention import supported

    assert supported(12, 768)  # ViT-B vision: hd=64, head pairs
    assert supported(8, 512)  # CLIP text: hd=64
    assert supported(2, 256)  # hd=128: one head per group
    assert supported(8, 256)  # hd=32: 4 heads per group
    assert not supported(2, 32)  # hd=16, H=2 < heads_per_block
    assert not supported(3, 96)  # hd=32, H=3 not divisible by 4


# geometries: hd=64 (head pairs), hd=128 (single head), hd=32 (4-head groups)
@pytest.mark.parametrize("B,L,D,H", [(4, 11, 128, 2), (3, 17, 384, 3), (2, 9, 256, 8)])
@pytest.mark.parametrize("causal", [False, True])
def test_forward_parity(rng, B, L, D, H, causal):
    qkv = _rand_qkv(rng, B, L, D)
    mask = None
    if causal:
        mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    out = fused_attention(qkv, mask, H, True)
    ref = reference_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradient_parity(rng):
    B, L, D, H = 4, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss_fused(q):
        return ((fused_attention(q, mask, H, True) - tgt) ** 2).sum()

    def loss_ref(q):
        return ((reference_attention(q, mask, H) - tgt) ** 2).sum()

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3, rtol=1e-4)


def test_model_level_parity(rng):
    """attn_impl='pallas' must match 'einsum' through a whole tower, with the
    identical param tree (checkpoints unaffected)."""
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    # widen ViT-Test so head_dim=64 hits the kernel's supported geometry
    wide = dict(
        vision_cfg=dict(width=128, heads=2),
        text_cfg=dict(width=128, heads=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="einsum", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="pallas", **wide)
    assert jax.tree_util.tree_structure(b1.params) == jax.tree_util.tree_structure(
        b2.params
    )
    i1 = np.asarray(b1.encode_image(imgs, normalize=False))
    i2 = np.asarray(b2.encode_image(imgs, params=b1.params, normalize=False))
    t1 = np.asarray(b1.encode_text(texts, normalize=False))
    t2 = np.asarray(b2.encode_text(texts, params=b1.params, normalize=False))
    np.testing.assert_allclose(i2, i1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t2, t1, atol=1e-4, rtol=1e-4)


def test_sharded_batch_partitioning(rng):
    """Under a batch-sharded mesh the custom-partitioning rule must keep the
    kernel per-shard (no gather) and produce reference results + grads."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, L, D, H = 16, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qkv_s = jax.device_put(qkv, sh)

    @jax.jit
    def fwd(q):
        return fused_attention(q, mask, H, True)

    out = fwd(qkv_s)
    ref = reference_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @jax.jit
    def loss(q):
        return (fused_attention(q, mask, H, True) ** 2).sum()

    g = jax.grad(loss)(qkv_s)
    g_ref = jax.grad(lambda q: (reference_attention(q, mask, H) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)


def _to_interleaved(qkv, H, D):
    from spatial_clip_tpu.ops.fused_attention import interleave_perm

    perm = np.asarray(interleave_perm(H, D // H))
    return qkv[:, :, perm], perm


@pytest.mark.parametrize("B,L,D,H", [(4, 11, 128, 2), (2, 9, 256, 8)])
def test_interleaved_forward_parity(rng, B, L, D, H):
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    qkv_i, _ = _to_interleaved(qkv, H, D)
    out = fused_attention(jnp.asarray(qkv_i), mask, H, True, True)
    ref = reference_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_interleaved_gradient_parity(rng):
    B, L, D, H = 4, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    qkv_i, perm = _to_interleaved(qkv, H, D)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss_inter(q):
        return ((fused_attention(q, mask, H, True, True) - tgt) ** 2).sum()

    def loss_ref(q):
        return ((reference_attention(q, mask, H) - tgt) ** 2).sum()

    g_i = jax.grad(loss_inter)(jnp.asarray(qkv_i))
    g_ref = np.asarray(jax.grad(loss_ref)(qkv))
    # the interleaved cotangent comes back in interleaved column order
    np.testing.assert_allclose(
        np.asarray(g_i), g_ref[:, :, perm], atol=1e-3, rtol=1e-4
    )


def test_model_level_parity_interleaved(rng):
    """attn_impl='pallas_inter' must match 'einsum' exactly, with the same
    param tree (the weight-column permutation never touches checkpoints)."""
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    wide = dict(
        vision_cfg=dict(width=128, heads=2),
        text_cfg=dict(width=128, heads=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="einsum", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="pallas_inter", **wide)
    assert jax.tree_util.tree_structure(b1.params) == jax.tree_util.tree_structure(
        b2.params
    )
    i1 = np.asarray(b1.encode_image(imgs, normalize=False))
    i2 = np.asarray(b2.encode_image(imgs, params=b1.params, normalize=False))
    t1 = np.asarray(b1.encode_text(texts, normalize=False))
    t2 = np.asarray(b2.encode_text(texts, params=b1.params, normalize=False))
    np.testing.assert_allclose(i2, i1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t2, t1, atol=1e-4, rtol=1e-4)


def test_fast_softmax_parity(rng):
    """FAST_SOFTMAX (rowmax-shifted exp, post-dot normalization) is exactly
    softmax in real arithmetic; fwd+grad must match within fp32 rounding."""
    from spatial_clip_tpu.ops import fused_attention as fa

    B, L, D, H = 4, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss(q):
        return ((fused_attention(q, mask, H, True) - tgt) ** 2).sum()

    prev = fa.FAST_SOFTMAX
    fa.FAST_SOFTMAX = True
    try:
        out_fast = fused_attention(qkv, mask, H, True)
        g_fast = jax.grad(loss)(qkv)
    finally:
        fa.FAST_SOFTMAX = prev
    ref = reference_attention(qkv, mask, H)
    g_ref = jax.grad(lambda q: ((reference_attention(q, mask, H) - tgt) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-3)


def test_fast_softmax_overflow_robust(rng):
    """Scores far beyond the fp32 exp range (the regime that NaN'd the
    retired fixed-shift formulation at +108) must stay finite and exact:
    qkv scaled so raw scores reach ~1e4."""
    from spatial_clip_tpu.ops import fused_attention as fa

    B, L, D, H = 2, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D) * 40.0  # scores ~ (40 n)^2/8 >> 108
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss(q):
        return ((fused_attention(q, mask, H, True) - tgt) ** 2).sum()

    assert fa.FAST_SOFTMAX and not fa.FIXED_SHIFT  # shipped default
    out = fused_attention(qkv, mask, H, True)
    g = jax.grad(loss)(qkv)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(g)).all()
    ref = reference_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fixed_shift_knob_parity(rng):
    """The retired FIXED_SHIFT formulation still matches exact softmax on
    in-range scores (ships as the '~shift' A/B arm)."""
    from spatial_clip_tpu.ops import fused_attention as fa

    B, L, D, H = 4, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    prev = fa.FIXED_SHIFT
    fa.FIXED_SHIFT = True
    try:
        out = fused_attention(qkv, mask, H, True)
    finally:
        fa.FIXED_SHIFT = prev
    ref = reference_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# Packed head-pairs (PACK_PAIRS) and projection-fused attention (pallas3)
# ---------------------------------------------------------------------------


@pytest.fixture
def packed():
    from spatial_clip_tpu.ops import fused_attention as fa

    prev = fa.PACK_PAIRS
    fa.PACK_PAIRS = True
    yield
    fa.PACK_PAIRS = prev


# hd=64 pairs (packs), hd=32 4-head groups (packs pairwise), hd=128 (no pack)
@pytest.mark.parametrize("B,L,D,H", [(4, 11, 128, 2), (2, 9, 256, 8), (2, 9, 256, 2)])
@pytest.mark.parametrize("causal", [False, True])
def test_packed_forward_parity(rng, packed, B, L, D, H, causal):
    qkv = _rand_qkv(rng, B, L, D)
    mask = None
    if causal:
        mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    out = fused_attention(qkv, mask, H, True)
    ref = reference_attention(qkv, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_gradient_parity(rng, packed):
    B, L, D, H = 4, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    g1 = jax.grad(lambda q: ((fused_attention(q, mask, H, True) - tgt) ** 2).sum())(qkv)
    g2 = jax.grad(lambda q: ((reference_attention(q, mask, H) - tgt) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3, rtol=1e-4)


def test_packed_disabled_for_long_seq(rng, packed):
    """2L > 128 must keep the unpacked path (parity is the observable)."""
    B, L, D, H = 2, 77, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    out = fused_attention(qkv, None, H, True)
    ref = reference_attention(qkv, None, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _qkv_attn_ref(x, w, b, mask, H):
    qkv = x @ w + b
    return reference_attention(qkv, mask, H)


@pytest.mark.parametrize("causal", [False, True])
def test_qkv_attention_parity(rng, causal):
    """qkv_attention (projection-fused VJP) must match GEMM+reference for the
    output AND the grads wrt x, W, and b."""
    from spatial_clip_tpu.ops.fused_attention import qkv_attention

    B, L, Din, D, H = 3, 11, 128, 128, 2
    x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, 3 * D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.05)
    mask = None
    if causal:
        mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    out = qkv_attention(x, w, b, mask, H, True)
    ref = _qkv_attn_ref(x, w, b, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss(args):
        return ((qkv_attention(*args, mask, H, True) - tgt) ** 2).sum()

    def loss_ref(args):
        return ((_qkv_attn_ref(*args, mask, H) - tgt) ** 2).sum()

    g = jax.grad(loss)((x, w, b))
    g_ref = jax.grad(loss_ref)((x, w, b))
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-2, rtol=1e-3)


@pytest.mark.parametrize("mode", ["db", "dxdb"])
def test_qkv_attention_bwd_fuse_parity(rng, mode):
    """BWD_FUSE variants (in-kernel bias grad / input-grad GEMM) must produce
    the identical dx/dW/db as the plain d3 backward."""
    from spatial_clip_tpu.ops import fused_attention as fa

    B, L, Din, D, H = 3, 11, 128, 128, 2
    x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, 3 * D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss(args):
        return ((fa.qkv_attention(*args, mask, H, True) - tgt) ** 2).sum()

    def loss_ref(args):
        return ((_qkv_attn_ref(*args, mask, H) - tgt) ** 2).sum()

    prev = fa.BWD_FUSE
    try:
        fa.BWD_FUSE = mode
        g = jax.grad(loss)((x, w, b))
    finally:
        fa.BWD_FUSE = prev
    g_ref = jax.grad(loss_ref)((x, w, b))
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-2, rtol=1e-3)


def test_qkv_attention_packed_parity(rng, packed):
    from spatial_clip_tpu.ops.fused_attention import qkv_attention

    B, L, Din, D, H = 3, 9, 128, 128, 2
    x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, 3 * D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss(args):
        return ((qkv_attention(*args, mask, H, True) - tgt) ** 2).sum()

    def loss_ref(args):
        return ((_qkv_attn_ref(*args, mask, H) - tgt) ** 2).sum()

    np.testing.assert_allclose(
        np.asarray(qkv_attention(x, w, b, mask, H, True)),
        np.asarray(_qkv_attn_ref(x, w, b, mask, H)), atol=1e-4)
    g = jax.grad(loss)((x, w, b))
    g_ref = jax.grad(loss_ref)((x, w, b))
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-2, rtol=1e-3)


def test_model_level_parity_pallas3(rng):
    """attn_impl='pallas3' must match 'einsum' with the identical param
    tree (the projection params stay under the same 'qkv' collection)."""
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    wide = dict(
        vision_cfg=dict(width=128, heads=2),
        text_cfg=dict(width=128, heads=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="einsum", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="pallas3", **wide)
    assert jax.tree_util.tree_structure(b1.params) == jax.tree_util.tree_structure(
        b2.params
    )
    i1 = np.asarray(b1.encode_image(imgs, normalize=False))
    i2 = np.asarray(b2.encode_image(imgs, params=b1.params, normalize=False))
    t1 = np.asarray(b1.encode_text(texts, normalize=False))
    t2 = np.asarray(b2.encode_text(texts, params=b1.params, normalize=False))
    np.testing.assert_allclose(i2, i1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t2, t1, atol=1e-4, rtol=1e-4)


def test_qkv_attention_sharded_batch(rng):
    """Batch-sharded mesh: the bwd3 partitioning rule must keep the kernel
    per-shard and produce reference grads (dW all-reduced by GSPMD)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spatial_clip_tpu.ops.fused_attention import qkv_attention

    B, L, Din, D, H = 16, 9, 128, 128, 2
    x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, 3 * D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def loss(x, w, b):
        return (qkv_attention(x, w, b, mask, H, True) ** 2).sum()

    out = loss(x_s, w, b)
    ref = (_qkv_attn_ref(x, w, b, mask, H) ** 2).sum()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x_s, w, b)
    gx_r, gw_r = jax.grad(
        lambda x, w: (_qkv_attn_ref(x, w, b, mask, H) ** 2).sum(), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=2e-2,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=2e-2,
                               rtol=1e-3)


@pytest.fixture(params=["db", "dxdb"])
def dx_in_kernel(request):
    from spatial_clip_tpu.ops import fused_attention as fa

    prev = fa.BWD_FUSE
    fa.BWD_FUSE = request.param
    yield
    fa.BWD_FUSE = prev


@pytest.mark.parametrize("pack", [False, True])
def test_qkv_attention_dx_in_kernel(rng, dx_in_kernel, pack):
    """DX_IN_KERNEL (input-grad GEMM fused into the backward kernel) must
    reproduce the reference grads wrt x, W, b."""
    from spatial_clip_tpu.ops import fused_attention as fa

    prev = fa.PACK_PAIRS
    fa.PACK_PAIRS = pack
    try:
        B, L, Din, D, H = 4, 9, 128, 128, 2
        x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(Din, 3 * D)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.05)
        mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
        tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
        from spatial_clip_tpu.ops.fused_attention import qkv_attention

        def loss(args):
            return ((qkv_attention(*args, mask, H, True) - tgt) ** 2).sum()

        def loss_ref(args):
            return ((_qkv_attn_ref(*args, mask, H) - tgt) ** 2).sum()

        g = jax.grad(loss)((x, w, b))
        g_ref = jax.grad(loss_ref)((x, w, b))
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=2e-2, rtol=1e-3)
    finally:
        fa.PACK_PAIRS = prev


def test_fused_attention_t_parity(rng):
    """Seq-major-input variant (pallas_t): fwd + grads wrt qkv/bias must
    match the standard formulation."""
    from spatial_clip_tpu.ops.fused_attention import fused_attention_t

    B, L, D, H = 4, 11, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    bias = jnp.asarray(rng.normal(size=(1, 3 * D)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss_t(args):
        q, b = args
        out = fused_attention_t(q, b, mask, H, True)
        return ((out - tgt) ** 2).sum()

    def loss_ref(args):
        q, b = args
        return ((reference_attention(q + b[0], mask, H) - tgt) ** 2).sum()

    np.testing.assert_allclose(
        np.asarray(fused_attention_t(qkv, bias, mask, H, True)),
        np.asarray(reference_attention(qkv + bias[0], mask, H)), atol=1e-5)
    g = jax.grad(loss_t)((qkv, bias))
    g_ref = jax.grad(loss_ref)((qkv, bias))
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3,
                                   rtol=1e-4)


def test_fused_attention_t_no_mask(rng):
    from spatial_clip_tpu.ops.fused_attention import fused_attention_t

    B, L, D, H = 2, 9, 256, 8
    qkv = _rand_qkv(rng, B, L, D)
    bias = jnp.zeros((1, 3 * D), jnp.float32)
    out = fused_attention_t(qkv, bias, None, H, True)
    ref = reference_attention(qkv, None, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_model_level_parity_pallas_t(rng):
    from spatial_clip_tpu import create_model

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    wide = dict(
        vision_cfg=dict(width=128, heads=2),
        text_cfg=dict(width=128, heads=2),
    )
    b1 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="einsum", **wide)
    b2 = create_model("ViT-Test", precision="fp32", seed=0, attn_impl="pallas_t", **wide)
    assert jax.tree_util.tree_structure(b1.params) == jax.tree_util.tree_structure(
        b2.params
    )
    i1 = np.asarray(b1.encode_image(imgs, normalize=False))
    i2 = np.asarray(b2.encode_image(imgs, params=b1.params, normalize=False))
    t1 = np.asarray(b1.encode_text(texts, normalize=False))
    t2 = np.asarray(b2.encode_text(texts, params=b1.params, normalize=False))
    np.testing.assert_allclose(i2, i1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(t2, t1, atol=1e-4, rtol=1e-4)


def test_fused_attention_t_sharded_batch(rng):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spatial_clip_tpu.ops.fused_attention import fused_attention_t

    B, L, D, H = 16, 9, 128, 2
    qkv = _rand_qkv(rng, B, L, D)
    bias = jnp.asarray(rng.normal(size=(1, 3 * D)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    qkv_s = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def loss(q, b):
        out = fused_attention_t(q, b, mask, H, True)
        return (out ** 2).sum()

    gq, gb = jax.jit(jax.grad(loss, argnums=(0, 1)))(qkv_s, bias)
    ref_l = lambda q, b: (reference_attention(q + b[0], mask, H) ** 2).sum()
    gq_r, gb_r = jax.grad(ref_l, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_r), atol=2e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), atol=2e-3,
                               rtol=1e-4)


def test_heads_per_block_wide_request_degrades():
    """A wider-than-tower lane request resolves to the largest feasible
    group (the tower's own full width) instead of an infeasible 1-head
    group / XLA fallback — e.g. flanes768 on the 8-head text tower."""
    from spatial_clip_tpu.ops.fused_attention import heads_per_block

    assert heads_per_block(12, 64, 768) == 12  # ViT-B vision: one group
    assert heads_per_block(8, 64, 768) == 8    # CLIP text: degrades to 512
    assert heads_per_block(12, 64, 384) == 6   # intermediate: two groups
    assert heads_per_block(8, 64, 384) == 4    # 384->256 (8%6, 8%5 fail)
    assert heads_per_block(12, 64, 256) == 4   # shape-aware default kept
    assert heads_per_block(2, 16, 128) is None  # infeasible stays None


@pytest.mark.parametrize("flanes,B,L,D,H", [
    (768, 4, 13, 768, 12),  # vision-like: ONE full-width fwd group
    (768, 4, 9, 512, 8),    # text-like: degrades to 512 (one group)
    (384, 4, 11, 768, 12),  # two fwd groups, shape-aware bwd
])
def test_fwd_lanes_parity(rng, flanes, B, L, D, H):
    """FWD_LANES (fwd-only full-width groups) is a pure scheduling knob:
    fwd AND grad must match the reference exactly; bwd keeps its own
    shape-aware geometry and consumes the fwd's saved lse regardless of
    the fwd lane width."""
    from spatial_clip_tpu.ops import fused_attention as fa

    qkv = _rand_qkv(rng, B, L, D)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss(q):
        return ((fused_attention(q, mask, H, True) - tgt) ** 2).sum()

    prev = fa.FWD_LANES
    fa.FWD_LANES = flanes
    try:
        out = fused_attention(qkv, mask, H, True)
        g = jax.grad(loss)(qkv)
    finally:
        fa.FWD_LANES = prev
    ref = reference_attention(qkv, mask, H)
    g_ref = jax.grad(
        lambda q: ((reference_attention(q, mask, H) - tgt) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-3)


def test_qkv_attention_fwd_lanes_parity(rng):
    """FWD_LANES through the shipped default path (qkv_attention +
    SAVE_LSE + BWD_FUSE='db'): the wide-lane fwd's saved lse must feed the
    shape-aware bwd exactly — fwd/dx/dw/db all match the reference."""
    from spatial_clip_tpu.ops import fused_attention as fa
    from spatial_clip_tpu.ops.fused_attention import qkv_attention

    B, L, Din, D, H = 4, 13, 128, 768, 12
    x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, 3 * D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.05)
    mask = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
    tgt = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss(args):
        return ((qkv_attention(*args, mask, H, True) - tgt) ** 2).sum()

    def loss_ref(args):
        return ((_qkv_attn_ref(*args, mask, H) - tgt) ** 2).sum()

    assert fa.SAVE_LSE and fa.BWD_FUSE == "db"  # shipped default
    prev = fa.FWD_LANES
    fa.FWD_LANES = 768
    try:
        out = qkv_attention(x, w, b, mask, H, True)
        g = jax.grad(loss)((x, w, b))
    finally:
        fa.FWD_LANES = prev
    ref = _qkv_attn_ref(x, w, b, mask, H)
    g_ref = jax.grad(loss_ref)((x, w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-2, rtol=1e-3)
