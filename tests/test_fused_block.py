"""Block-fused attention-half kernel: interpret-mode parity vs the shipped
formulation (see ops/fused_block.py; A/B measured by
scripts/bench_block_kernel.py)."""
import numpy as np
import pytest

from spatial_clip_tpu.ops.fused_block import (
    fused_block_attn,
    reference_block_attn,
)


def _mk(B, L, D, heads, seed=0, causal=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (B, L, D)).astype(np.float32)
    lng = rng.normal(1, 0.1, (D,)).astype(np.float32)
    lnb = rng.normal(0, 0.1, (D,)).astype(np.float32)
    wqkv = (rng.normal(0, D ** -0.5, (D, 3 * D))).astype(np.float32)
    bqkv = rng.normal(0, 0.02, (3 * D,)).astype(np.float32)
    wout = (rng.normal(0, D ** -0.5, (D, D))).astype(np.float32)
    bout = rng.normal(0, 0.02, (D,)).astype(np.float32)
    mask = None
    if causal:
        mask = np.triu(np.full((L, L), -1e9, np.float32), 1)
    return x, lng, lnb, wqkv, bqkv, wout, bout, mask


@pytest.mark.parametrize("shape,causal", [
    ((4, 8, 256, 4), False),   # image-like, no mask (packed-pair path)
    ((4, 12, 128, 2), True),   # text-like, causal mask
    ((2, 16, 256, 4), False),  # odd block (per-head path)
])
def test_fused_block_matches_reference(shape, causal):
    B, L, D, heads = shape
    args = _mk(B, L, D, heads, causal=causal)
    x, lng, lnb, wqkv, bqkv, wout, bout, mask = args
    got = np.asarray(fused_block_attn(
        x, lng, lnb, wqkv, bqkv, wout, bout, mask, heads,
        interpret=True, block_cap=2,
    ))
    want = np.asarray(reference_block_attn(
        x, lng, lnb, wqkv, bqkv, wout, bout, mask, heads))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
