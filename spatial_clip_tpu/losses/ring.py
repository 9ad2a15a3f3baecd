"""Ring contrastive losses: O(local_B) memory at any global batch.

The reference's SigLIP `bidir`/`shift` NCCL rings (ref: src/open_clip/
loss.py:242-327,384-437) are the only blockwise pattern it ships; softmax
losses there still all-gather the full feature matrix. This module brings the
blockwise/ring pattern to the softmax losses (SURVEY.md §5 "long-context"
analogue; PAPERS.md "Breaking the Memory Barrier"/Inf-CL):

inside ``shard_map`` each device keeps only its feature shard; shards rotate
around the ICI ring via ``lax.ppermute`` while every device maintains an
online log-sum-exp + label-weighted sums for its local rows. The (N, N)
logit matrix never exists — per-step cost is one (B_local, B_local) block.
Soft labels are reconstructed per block from tile ids (same semantics as
ops/fused_contrastive.py). Gradients flow back through the ppermute chain
automatically.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _block_labels(row_gt_ids, blk_ids, nbr, alphas):
    """(B, Bblk) unnormalized labels: id-matched diag + alpha neighbors."""
    labels = (blk_ids[None, :] == row_gt_ids[:, None]).astype(jnp.float32)
    for j in range(nbr.shape[1]):
        labels = labels + (
            blk_ids[None, :] == nbr[:, j : j + 1]
        ).astype(jnp.float32) * alphas[:, j : j + 1]
    return labels


def _ring_direction(
    rows,  # (B, D) local row features (grad)
    blk0,  # (B, D) local column shard (starts the rotation)
    blk0_ids,  # (B,) its tile ids
    row_gt_ids,  # (B,) tile id that marks each row's positive column
    nbr,
    alphas,
    s_eff,
    axis_name: str,
):
    n = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    m = jnp.full((rows.shape[0], 1), -1e30, jnp.float32)
    s = jnp.zeros_like(m)
    t = jnp.zeros_like(m)
    mass = jnp.zeros_like(m)
    blk, blk_ids = blk0, blk0_ids
    for _ in range(n):
        z = (rows @ blk.T).astype(jnp.float32) * s_eff
        labels = _block_labels(row_gt_ids, blk_ids, nbr, alphas)
        m_new = jnp.maximum(m, z.max(axis=1, keepdims=True))
        s = s * jnp.exp(m - m_new) + jnp.exp(z - m_new).sum(axis=1, keepdims=True)
        m = m_new
        t = t + (z * labels).sum(axis=1, keepdims=True)
        mass = mass + labels.sum(axis=1, keepdims=True)
        if n > 1:
            blk = lax.ppermute(blk, axis_name, perm)
            blk_ids = lax.ppermute(blk_ids, axis_name, perm)
    lse = m + jnp.log(jnp.maximum(s, 1e-30))
    return (lse - t / jnp.maximum(mass, 1e-12))[:, 0]


def ring_spatial_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    image_tile_ids: jnp.ndarray,
    text_tile_ids: jnp.ndarray,
    neighbor_tile_ids: jnp.ndarray,
    neighbor_alphas: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    cap_logit_scale: Optional[float] = None,
    neighbor_alpha_scale: float = 1.0,
    **_unused,
) -> Dict[str, jnp.ndarray]:
    """Spatial multi-positive loss via ring rotation (shard_map only).

    Sets ``alphas<0 or pad -> 0``; the diagonal positive is found by tile-id
    equality (assumes unique tile ids in the global batch, like the fused
    kernel). With ``axis_name=None`` falls back to a single 'ring' step,
    i.e. the plain in-batch loss.
    """
    s_eff = logit_scale
    if cap_logit_scale is not None:
        s_clipped = jnp.minimum(logit_scale, cap_logit_scale)
        s_eff = logit_scale + lax.stop_gradient(s_clipped - logit_scale)
    alphas = jnp.maximum(neighbor_alphas.astype(jnp.float32) * neighbor_alpha_scale, 0.0)
    alphas = jnp.where(neighbor_tile_ids >= 0, alphas, 0.0)
    nbr = neighbor_tile_ids.astype(jnp.int32)

    if axis_name is None:
        # degenerate single-block case: no rotation
        z_i = (image_features @ text_features.T).astype(jnp.float32) * s_eff
        z_t = (text_features @ image_features.T).astype(jnp.float32) * s_eff
        li = _single_block(z_i, text_tile_ids, image_tile_ids, nbr, alphas)
        lt = _single_block(z_t, image_tile_ids, text_tile_ids, nbr, alphas)
        return {"contrastive_loss": 0.5 * (li.mean() + lt.mean())}

    # rows' positive column id: the anchor's own tile id in the opposite tower
    loss_i = _ring_direction(
        image_features, text_features, text_tile_ids.astype(jnp.int32),
        image_tile_ids.astype(jnp.int32), nbr, alphas, s_eff, axis_name,
    )
    loss_t = _ring_direction(
        text_features, image_features, image_tile_ids.astype(jnp.int32),
        text_tile_ids.astype(jnp.int32), nbr, alphas, s_eff, axis_name,
    )
    total = 0.5 * (loss_i.mean() + loss_t.mean())
    return {"contrastive_loss": lax.pmean(total, axis_name)}


def _single_block(z, col_ids, row_ids, nbr, alphas):
    labels = _block_labels(row_ids.astype(jnp.int32), col_ids.astype(jnp.int32), nbr, alphas)
    labels = labels / jnp.maximum(labels.sum(axis=1, keepdims=True), 1e-12)
    return -(jax.nn.log_softmax(z, axis=1) * labels).sum(axis=1)
