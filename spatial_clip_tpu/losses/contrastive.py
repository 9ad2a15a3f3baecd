"""Contrastive losses, TPU-native.

Re-designs of the reference losses as pure functions:

- ``clip_loss``    — symmetric InfoNCE (ref: src/open_clip/loss.py:68-155).
- ``spatial_loss`` — multi-positive spatial CLIP with soft neighbor labels
  (ref: src/models/components/losses.py:11-124 and
  src/open_clip_train/spatial_loss.py:10-155). The reference's O(B·k) Python
  dict loop building the soft-label matrix becomes a vectorized tile-id
  equality match on device.
- ``siglip_loss``  — pairwise sigmoid loss (ref: loss.py:330-464) with
  ``gather`` and ``shift``/``bidir`` (ppermute ring) distributed impls.

Distribution model: every loss takes ``axis_name``. With ``axis_name=None``
the inputs are global arrays — use under plain ``jit`` where GSPMD shards the
math (batch-sharded inputs produce exactly the reference's ``local_loss``
row/col factorization automatically). With ``axis_name='data'`` the function
is being traced inside ``shard_map`` over per-device shards and performs
explicit ``lax.all_gather``/``ppermute`` collectives over ICI; gradients flow
through JAX collectives automatically (= reference ``gather_with_grad``).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(x, axis=-1)


def _sum_mean_over_axis(local_mean: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    """Global mean of a per-device local mean."""
    if axis_name is None:
        return local_mean
    return lax.pmean(local_mean, axis_name)


def gather_features(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    axis_name: Optional[str],
):
    """All-gather features over the mesh axis (ref: loss.py:21-65).

    Under JAX AD, gradients flow back through all_gather to the local shard —
    the behavior the reference needs ``torch.distributed.nn.all_gather``
    (``gather_with_grad=True``) for.
    """
    if axis_name is None:
        return image_features, text_features
    all_img = lax.all_gather(image_features, axis_name, tiled=True)
    all_txt = lax.all_gather(text_features, axis_name, tiled=True)
    return all_img, all_txt


def _apply_logit_scale(
    z: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray],
    cap_logit_scale: Optional[float],
    float32_logits: bool,
) -> jnp.ndarray:
    s_eff = logit_scale
    if cap_logit_scale is not None:
        # straight-through cap (ref: losses.py:73-77): forward uses the
        # clipped scale, backward sees the raw scale.
        s_clipped = jnp.minimum(logit_scale, cap_logit_scale)
        s_eff = logit_scale + lax.stop_gradient(s_clipped - logit_scale)
    logits = s_eff * z
    if logit_bias is not None:
        logits = logits + logit_bias
    if float32_logits:
        logits = logits.astype(jnp.float32)
    return logits


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    float32_logits: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Symmetric InfoNCE. Local rows x global cols with shifted labels
    (= reference ``local_loss=True`` math, loss.py:91-130)."""
    B = image_features.shape[0]
    all_img, all_txt = gather_features(image_features, text_features, axis_name)
    z_i = image_features @ all_txt.T
    z_t = text_features @ all_img.T
    logits_i = _apply_logit_scale(z_i, logit_scale, logit_bias, None, float32_logits)
    logits_t = _apply_logit_scale(z_t, logit_scale, logit_bias, None, float32_logits)
    shift = 0 if axis_name is None else B * lax.axis_index(axis_name)
    labels = jnp.arange(B, dtype=jnp.int32) + shift
    loss_i = -jnp.take_along_axis(_log_softmax(logits_i), labels[:, None], axis=1).mean()
    loss_t = -jnp.take_along_axis(_log_softmax(logits_t), labels[:, None], axis=1).mean()
    total = 0.5 * (loss_i + loss_t)
    return {"contrastive_loss": _sum_mean_over_axis(total, axis_name)}


def build_spatial_soft_labels(
    all_tile_ids: jnp.ndarray,  # (N,) int32 — gathered anchor tile ids
    ground_truth_cols: jnp.ndarray,  # (B,) int32 — diag column per local row
    neighbor_tile_ids: jnp.ndarray,  # (B, k) int32, -1 padded
    neighbor_alphas: jnp.ndarray,  # (B, k) float
    neighbor_alpha_scale: float = 1.0,
) -> jnp.ndarray:
    """Vectorized soft-label matrix (B, N).

    Replaces the reference's per-sample Python dict loop
    (ref: losses.py:91-111) with k static passes of a (B, N) tile-id equality
    mask — fully on-device, static shapes, VPU-friendly. Rows are
    L1-normalized. If a neighbor tile id appears in multiple gathered columns
    (duplicate sampling) the weight lands on every match, a superset of the
    reference's dict behavior (which keeps one arbitrary column).
    """
    B = neighbor_tile_ids.shape[0]
    N = all_tile_ids.shape[0]
    k = neighbor_tile_ids.shape[1]
    labels = jax.nn.one_hot(ground_truth_cols, N, dtype=jnp.float32)
    alphas = jnp.maximum(neighbor_alphas.astype(jnp.float32) * neighbor_alpha_scale, 0.0)
    alphas = jnp.where(neighbor_tile_ids >= 0, alphas, 0.0)
    ids_row = all_tile_ids.astype(jnp.int32)[None, :]  # (1, N)
    for j in range(k):  # k is small & static (typically 6)
        match = (neighbor_tile_ids[:, j : j + 1] == ids_row).astype(jnp.float32)
        labels = labels + match * alphas[:, j : j + 1]
    return labels / jnp.maximum(labels.sum(axis=1, keepdims=True), 1e-12)


def spatial_loss(
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
    temp_reg_weight: float = 0.0,
    float32_logits: bool = True,
    neighbor_alpha_scale: float = 1.0,
    use_fused_kernel: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Multi-positive spatial contrastive loss (ref: losses.py:44-124).

    Soft cross-entropy against an L1-normalized label matrix that puts mass 1
    on the matched tile and ``alpha_k`` on each spatial neighbor present in
    the (gathered) batch, in both image->text and text->image directions,
    plus an optional temperature regularizer ``(E_p[z]-E_q[z])^2``
    (ref: losses.py:117-122).
    """
    B = image_features.shape[0]
    all_img, all_txt = gather_features(image_features, text_features, axis_name)
    if axis_name is None:
        all_img_ids, all_txt_ids = image_tile_ids, text_tile_ids
        shift = 0
    else:
        all_img_ids = lax.all_gather(image_tile_ids, axis_name, tiled=True)
        all_txt_ids = lax.all_gather(text_tile_ids, axis_name, tiled=True)
        shift = B * lax.axis_index(axis_name)

    ground_truth = jnp.arange(B, dtype=jnp.int32) + shift

    if use_fused_kernel and temp_reg_weight == 0.0 and logit_bias is None:
        # Pallas path: labels are built from tile ids INSIDE the kernel, so
        # skip the dense (B, N) label matrices entirely (O(B) memory).
        from spatial_clip_tpu.ops.fused_contrastive import fused_spatial_ce

        s_eff = logit_scale
        if cap_logit_scale is not None:
            s_clipped = jnp.minimum(logit_scale, cap_logit_scale)
            s_eff = logit_scale + lax.stop_gradient(s_clipped - logit_scale)
        scaled_alphas = neighbor_alphas.astype(jnp.float32) * neighbor_alpha_scale
        interpret = jax.default_backend() != "tpu"  # pallas TPU or interpreter
        loss_i = fused_spatial_ce(
            image_features, all_txt, all_txt_ids.astype(jnp.int32),
            ground_truth, neighbor_tile_ids.astype(jnp.int32), scaled_alphas, s_eff,
            interpret=interpret,
        ).mean()
        loss_t = fused_spatial_ce(
            text_features, all_img, all_img_ids.astype(jnp.int32),
            ground_truth, neighbor_tile_ids.astype(jnp.int32), scaled_alphas, s_eff,
            interpret=interpret,
        ).mean()
        total = 0.5 * (loss_i + loss_t)
        return {"contrastive_loss": _sum_mean_over_axis(total, axis_name)}

    labels_i = build_spatial_soft_labels(
        all_txt_ids, ground_truth, neighbor_tile_ids, neighbor_alphas,
        neighbor_alpha_scale,
    )
    labels_t = build_spatial_soft_labels(
        all_img_ids, ground_truth, neighbor_tile_ids, neighbor_alphas,
        neighbor_alpha_scale,
    )

    z_i = image_features @ all_txt.T
    z_t = text_features @ all_img.T
    logits_i = _apply_logit_scale(z_i, logit_scale, logit_bias, cap_logit_scale, float32_logits)
    logits_t = _apply_logit_scale(z_t, logit_scale, logit_bias, cap_logit_scale, float32_logits)

    loss_i = -(_log_softmax(logits_i) * labels_i).sum(axis=1).mean()
    loss_t = -(_log_softmax(logits_t) * labels_t).sum(axis=1).mean()
    total = 0.5 * (loss_i + loss_t)

    if temp_reg_weight > 0:
        p_i = jax.nn.softmax(logits_i, axis=1)
        p_t = jax.nn.softmax(logits_t, axis=1)
        z_i32, z_t32 = z_i.astype(jnp.float32), z_t.astype(jnp.float32)
        ez_p_i = (p_i * z_i32).sum(axis=1).mean()
        ez_q_i = (labels_i * z_i32).sum(axis=1).mean()
        ez_p_t = (p_t * z_t32).sum(axis=1).mean()
        ez_q_t = (labels_t * z_t32).sum(axis=1).mean()
        gap = 0.5 * ((ez_p_i - ez_q_i) + (ez_p_t - ez_q_t))
        if axis_name is not None:
            gap = lax.pmean(gap, axis_name)
        total = total + temp_reg_weight * gap**2

    return {"contrastive_loss": _sum_mean_over_axis(total, axis_name)}


def distill_clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    dist_image_features: jnp.ndarray,
    dist_text_features: jnp.ndarray,
    dist_logit_scale: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    float32_logits: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Teacher-student distillation CLIP loss (ref: loss.py:203-239
    DistillClipLoss): standard InfoNCE + soft CE between the teacher's
    softmax distribution and the student's logits, both directions."""
    B = image_features.shape[0]
    all_img, all_txt = gather_features(image_features, text_features, axis_name)
    d_all_img, d_all_txt = gather_features(
        dist_image_features, dist_text_features, axis_name
    )
    base = clip_loss(
        image_features, text_features, logit_scale,
        logit_bias=logit_bias, axis_name=axis_name, float32_logits=float32_logits,
    )["contrastive_loss"]

    logits_i = (image_features @ all_txt.T * logit_scale).astype(jnp.float32)
    logits_t = (text_features @ all_img.T * logit_scale).astype(jnp.float32)
    t_logits_i = lax.stop_gradient(
        (dist_image_features @ d_all_txt.T * dist_logit_scale).astype(jnp.float32)
    )
    t_logits_t = lax.stop_gradient(
        (dist_text_features @ d_all_img.T * dist_logit_scale).astype(jnp.float32)
    )

    def soft_ce(student, teacher):
        return -(jax.nn.softmax(teacher, axis=1) * jax.nn.log_softmax(student, axis=1)).sum(1).mean()

    distill = 0.5 * (soft_ce(logits_i, t_logits_i) + soft_ce(logits_t, t_logits_t))
    distill = _sum_mean_over_axis(distill, axis_name)
    return {
        "contrastive_loss": base + distill,
        "distill_loss": distill,
    }


def _siglip_pair_loss(
    img: jnp.ndarray,
    txt: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    negative_only: bool,
) -> jnp.ndarray:
    """Sum of pairwise sigmoid losses for one (img-block, txt-block) pair
    (ref: loss.py:352-381)."""
    logits = (logit_scale * (img @ txt.T) + logit_bias).astype(jnp.float32)
    if negative_only:
        labels = -jnp.ones_like(logits)
    else:
        labels = 2.0 * jnp.eye(logits.shape[0], logits.shape[1], dtype=jnp.float32) - 1.0
    return -jax.nn.log_sigmoid(labels * logits).sum()


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = None,
    dist_impl: str = "shift",
) -> Dict[str, jnp.ndarray]:
    """SigLIP pairwise sigmoid loss (ref: loss.py:330-464).

    ``dist_impl``:
    - ``gather``: all_gather text features, one big block (simple, memory-heavy)
    - ``shift``:  one-directional ppermute ring — each step computes the
      negatives block against one remote text shard (ref `shift`/`bidir`
      NCCL ring, loss.py:384-437; TPU-native as ICI neighbor permute)
    - ``bidir``:  two counter-rotating rings, halves ring latency.
    """
    B = image_features.shape[0]
    loss = _siglip_pair_loss(
        image_features, text_features, logit_scale, logit_bias, negative_only=False
    )
    if axis_name is not None:
        n = lax.axis_size(axis_name)
        if dist_impl == "gather":
            all_txt = lax.all_gather(text_features, axis_name, tiled=True)
            idx = lax.axis_index(axis_name)
            # negatives against every other device's text block
            mask = jnp.arange(n) != idx
            blocks = all_txt.reshape(n, B, -1)

            def body(i, acc):
                blk = blocks[i]
                neg = _siglip_pair_loss(
                    image_features, blk, logit_scale, logit_bias, negative_only=True
                )
                return acc + jnp.where(mask[i], neg, 0.0)

            loss = lax.fori_loop(0, n, body, loss)
        elif dist_impl == "reduce":
            # masked all_reduce materialization of the global text matrix
            # (ref: loss.py `reduce` impl): each device contributes its block
            # to a zero buffer; psum assembles it.
            idx = lax.axis_index(axis_name)
            buf = jnp.zeros((n,) + text_features.shape, text_features.dtype)
            buf = buf.at[idx].set(text_features)
            blocks = lax.psum(buf, axis_name)
            mask = jnp.arange(n) != idx

            def body(i, acc):
                neg = _siglip_pair_loss(
                    image_features, blocks[i], logit_scale, logit_bias,
                    negative_only=True,
                )
                return acc + jnp.where(mask[i], neg, 0.0)

            loss = lax.fori_loop(0, n, body, loss)
        elif dist_impl in ("shift", "bidir"):
            perm_fwd = [(i, (i + 1) % n) for i in range(n)]
            perm_bwd = [(i, (i - 1) % n) for i in range(n)]
            if dist_impl == "shift":
                txt = text_features
                for _ in range(n - 1):
                    txt = lax.ppermute(txt, axis_name, perm_fwd)
                    loss = loss + _siglip_pair_loss(
                        image_features, txt, logit_scale, logit_bias, negative_only=True
                    )
            else:  # bidir: rotate two halves in opposite directions
                txt_r = text_features
                txt_l = text_features
                steps = (n - 1) // 2
                for _ in range(steps):
                    txt_r = lax.ppermute(txt_r, axis_name, perm_fwd)
                    txt_l = lax.ppermute(txt_l, axis_name, perm_bwd)
                    loss = loss + _siglip_pair_loss(
                        image_features, txt_r, logit_scale, logit_bias, True
                    )
                    loss = loss + _siglip_pair_loss(
                        image_features, txt_l, logit_scale, logit_bias, True
                    )
                if (n - 1) % 2:
                    txt_r = lax.ppermute(txt_r, axis_name, perm_fwd)
                    loss = loss + _siglip_pair_loss(
                        image_features, txt_r, logit_scale, logit_bias, True
                    )
        else:
            raise ValueError(f"unknown siglip dist_impl: {dist_impl}")
    loss = loss / B
    return {"contrastive_loss": _sum_mean_over_axis(loss, axis_name)}
