"""Fused spatial multi-positive contrastive loss — Pallas TPU kernel.

The reference computes ``logits = s * I @ T^T`` (B, N), materializes a dense
soft-label matrix via a Python dict loop, then soft-CE
(ref: src/models/components/losses.py:78-115). SURVEY.md §2.4 marks this the
#1 Pallas target. This kernel fuses, per (row-block, col-block) tile:

  1. the similarity matmul on the MXU,
  2. soft-label construction on the fly from tile ids
     (``col == gt`` diag + ``alpha_k`` where ``col == neighbor_k``) on the VPU,
  3. an online (flash-style) log-sum-exp and the label-weighted logit sum,

so neither the (B, N) logit matrix nor the label matrix ever exists in HBM —
the loss is O(B) memory for any global batch N. Backward recomputes tiles
(same trick) in two kernels (dq over row blocks, dK over col blocks).

Loss per row i (labels L1-normalized by ``mass_i``):

    loss_i = LSE_j(z_ij) - (sum_j l_ij * z_ij) / mass_i,   z = s * q @ K^T
    mass_i = 1 + sum_k alpha_ik * #{j: col_id_j == nbr_ik}
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _labels_block(
    col_ids: jnp.ndarray,  # (1, BN) int32
    gt: jnp.ndarray,  # (BM, 1) int32
    nbr: jnp.ndarray,  # (BM, k) int32
    alphas: jnp.ndarray,  # (BM, k) f32
) -> jnp.ndarray:
    """Unnormalized label block (BM, BN) built from tile ids on the VPU."""
    labels = (col_ids == gt).astype(jnp.float32)
    k = nbr.shape[1]
    for j in range(k):  # k static & small
        match = (col_ids == nbr[:, j:j + 1]).astype(jnp.float32)
        labels = labels + match * alphas[:, j:j + 1]
    return labels


def _fwd_kernel(
    n_cols_ref,  # SMEM (1,)
    q_ref,  # (BM, D)
    k_ref,  # (BN, D)
    colid_ref,  # (1, BN) int32 — global column tile-ids
    gt_ref,  # (BM, 1) int32
    nbr_ref,  # (BM, K)
    alpha_ref,  # (BM, K)
    scale_ref,  # SMEM (1,)
    loss_ref,  # out (BM, 1)
    lse_ref,  # out (BM, 1)
    mass_ref,  # out (BM, 1)
    m_scr,  # scratch (BM, 1)
    s_scr,
    t_scr,
    mass_scr,
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    BN = k_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)
        t_scr[:] = jnp.zeros_like(t_scr)
        mass_scr[:] = jnp.zeros_like(mass_scr)

    scale = scale_ref[0]
    z = jax.lax.dot_general(
        q_ref[:], k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BM, BN)

    # mask padded columns
    col_idx = j * BN + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    valid = col_idx < n_cols_ref[0]
    z = jnp.where(valid, z, NEG_INF)

    labels = _labels_block(colid_ref[:], gt_ref[:], nbr_ref[:], alpha_ref[:])
    labels = jnp.where(valid, labels, 0.0)

    # online LSE update
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, z.max(axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    s_scr[:] = s_scr[:] * corr + jnp.exp(z - m_new).sum(axis=1, keepdims=True)
    m_scr[:] = m_new
    # label-weighted logit sum; padded cols contribute 0 (labels==0 there,
    # and z=NEG_INF * 0 would be nan -> use where)
    zl = jnp.where(valid, z * labels, 0.0)
    t_scr[:] = t_scr[:] + zl.sum(axis=1, keepdims=True)
    mass_scr[:] = mass_scr[:] + labels.sum(axis=1, keepdims=True)

    @pl.when(j == n_j - 1)
    def _finalize():
        lse = m_scr[:] + jnp.log(jnp.maximum(s_scr[:], 1e-30))
        mass = jnp.maximum(mass_scr[:], 1e-12)
        loss_ref[:] = lse - t_scr[:] / mass
        lse_ref[:] = lse
        mass_ref[:] = mass


def _dq_kernel(
    n_cols_ref,
    q_ref, k_ref, colid_ref, gt_ref, nbr_ref, alpha_ref, scale_ref,
    lse_ref, mass_ref, g_ref,  # g: (BM,1) upstream grad per row
    dq_ref,  # out (BM, D)
    ds_ref,  # out (1, 1) dscale partial accumulated over whole grid
    acc_scr,  # scratch (BM, D)
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    BN = k_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_ds():
        ds_ref[0, 0] = 0.0

    scale = scale_ref[0]
    zraw = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = zraw * scale
    col_idx = j * BN + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    valid = col_idx < n_cols_ref[0]
    p = jnp.where(valid, jnp.exp(z - lse_ref[:]), 0.0)
    labels = _labels_block(colid_ref[:], gt_ref[:], nbr_ref[:], alpha_ref[:])
    labels = jnp.where(valid, labels, 0.0)
    dz = (p - labels / mass_ref[:]) * g_ref[:]  # (BM, BN)
    acc_scr[:] += scale * jax.lax.dot_general(
        dz, k_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_ref[0, 0] += (dz * zraw).sum()

    @pl.when(j == n_j - 1)
    def _emit():
        dq_ref[:] = acc_scr[:]


def _dk_kernel(
    n_cols_ref,
    q_ref, k_ref, colid_ref, gt_ref, nbr_ref, alpha_ref, scale_ref,
    lse_ref, mass_ref, g_ref,
    dk_ref,  # out (BN, D)
    acc_scr,  # (BN, D)
):
    j = pl.program_id(0)  # col block
    i = pl.program_id(1)  # row block (inner loop)
    n_i = pl.num_programs(1)
    BN = k_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    scale = scale_ref[0]
    z = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col_idx = j * BN + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    valid = col_idx < n_cols_ref[0]
    p = jnp.where(valid, jnp.exp(z - lse_ref[:]), 0.0)
    labels = _labels_block(colid_ref[:], gt_ref[:], nbr_ref[:], alpha_ref[:])
    labels = jnp.where(valid, labels, 0.0)
    dz = (p - labels / mass_ref[:]) * g_ref[:]
    acc_scr[:] += scale * jax.lax.dot_general(
        dz, q_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_i - 1)
    def _emit():
        dk_ref[:] = acc_scr[:]


def _pad_to(x, mult, axis, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9)
)
def fused_spatial_ce(
    q, kmat, col_ids, gt, nbr, alphas, scale,
    block_m: int = 128, block_n: int = 512, interpret: bool = False,
):
    """Per-row soft-CE losses (B,) for the spatial multi-positive loss.

    q: (B, D) local features; kmat: (N, D) gathered opposite-tower features;
    col_ids: (N,) tile ids of the gathered columns; gt: (B,) ground-truth
    column index per row; nbr/alphas: (B, k) neighbor tile ids (-1 pad) and
    weights; scale: scalar effective logit scale.
    """
    loss, _, _ = _fwd_impl(q, kmat, col_ids, gt, nbr, alphas, scale,
                           block_m, block_n, interpret)
    return loss


def _fwd_impl(q, kmat, col_ids, gt, nbr, alphas, scale, block_m, block_n, interpret):
    B, D = q.shape
    N = kmat.shape[0]
    qp = _pad_to(q.astype(jnp.float32), block_m, 0)
    kp = _pad_to(kmat.astype(jnp.float32), block_n, 0)
    cid = _pad_to(col_ids.astype(jnp.int32).reshape(1, -1), block_n, 1, value=-2)
    # ground truth as the COLUMN TILE ID at the gt index so the diag match is
    # id-based inside blocks
    gt_ids = col_ids.astype(jnp.int32)[gt]
    gtp = _pad_to(gt_ids.reshape(-1, 1), block_m, 0, value=-9)
    nbrp = _pad_to(nbr.astype(jnp.int32), block_m, 0, value=-9)
    alphap = _pad_to(jnp.maximum(alphas.astype(jnp.float32), 0.0), block_m, 0)
    Bp, Np = qp.shape[0], kp.shape[0]
    grid = (Bp // block_m, Np // block_n)
    K = nbrp.shape[1]

    out_shapes = [
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # loss
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # lse
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # mass
    ]
    in_specs = [
        pl.BlockSpec((block_m, D), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, D), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, K), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, K), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scale (1,)
    ]
    out_specs = [
        pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    loss, lse, mass = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((block_m, 1), jnp.float32)] * 4,
        ),
        out_shape=out_shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * D, bytes_accessed=4 * (Bp * D + Np * D), transcendentals=Bp * Np
        ),
    )(
        jnp.asarray([N], jnp.int32),
        qp, kp, cid, gtp, nbrp, alphap,
        jnp.asarray([scale], jnp.float32).reshape(1),
    )
    return loss[:B, 0], lse, mass


def _fused_fwd(q, kmat, col_ids, gt, nbr, alphas, scale, block_m, block_n, interpret):
    loss, lse, mass = _fwd_impl(
        q, kmat, col_ids, gt, nbr, alphas, scale, block_m, block_n, interpret
    )
    return loss, (q, kmat, col_ids, gt, nbr, alphas, scale, lse, mass)


def _fused_bwd(block_m, block_n, interpret, res, g):
    q, kmat, col_ids, gt, nbr, alphas, scale, lse, mass = res
    B, D = q.shape
    N = kmat.shape[0]
    qp = _pad_to(q.astype(jnp.float32), block_m, 0)
    kp = _pad_to(kmat.astype(jnp.float32), block_n, 0)
    cid = _pad_to(col_ids.astype(jnp.int32).reshape(1, -1), block_n, 1, value=-2)
    gt_ids = col_ids.astype(jnp.int32)[gt]
    gtp = _pad_to(gt_ids.reshape(-1, 1), block_m, 0, value=-9)
    nbrp = _pad_to(nbr.astype(jnp.int32), block_m, 0, value=-9)
    alphap = _pad_to(jnp.maximum(alphas.astype(jnp.float32), 0.0), block_m, 0)
    gp = _pad_to(g.astype(jnp.float32).reshape(-1, 1), block_m, 0)
    Bp, Np = qp.shape[0], kp.shape[0]
    K = nbrp.shape[1]
    scale_arr = jnp.asarray([scale], jnp.float32).reshape(1)
    n_arr = jnp.asarray([N], jnp.int32)

    common_in = [qp, kp, cid, gtp, nbrp, alphap, scale_arr, lse, mass, gp]

    def spec_row(i_map):
        return [
            pl.BlockSpec((block_m, D), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, D), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, K), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, K), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        ]

    dq, dscale = pl.pallas_call(
        _dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // block_m, Np // block_n),
            in_specs=spec_row(None),
            out_specs=[
                pl.BlockSpec((block_m, D), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(n_arr, *common_in)

    # dK: grid over col blocks, inner loop over row blocks
    dk_specs = [
        pl.BlockSpec((block_m, D), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, D), lambda j, i, *_: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda j, i, *_: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, K), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, K), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((block_m, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    dk = pl.pallas_call(
        _dk_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // block_n, Bp // block_m),
            in_specs=dk_specs,
            out_specs=pl.BlockSpec(
                (block_n, D), lambda j, i, *_: (j, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((block_n, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        interpret=interpret,
    )(n_arr, *common_in)

    import numpy as np

    def int_zero_tangent(x):
        return np.zeros(np.shape(x), dtype=jax.dtypes.float0)

    return (
        dq[:B].astype(q.dtype),
        dk[:N].astype(kmat.dtype),
        int_zero_tangent(col_ids),
        int_zero_tangent(gt),
        int_zero_tangent(nbr),
        jnp.zeros_like(alphas),  # alphas treated as data, not diff target
        (dscale[0, 0]).astype(jnp.asarray(scale).dtype),
    )


fused_spatial_ce.defvjp(_fused_fwd, _fused_bwd)


def fused_soft_ce_loss(
    q: jnp.ndarray,
    kmat: jnp.ndarray,
    labels: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense-label fallback API: mean soft-CE via the fused kernel is only
    available for id-based labels; with dense labels delegate to XLA (it
    fuses this well for moderate N)."""
    z = (q @ kmat.T) * scale
    if bias is not None:
        z = z + bias
    z = z.astype(jnp.float32)
    return -(jax.nn.log_softmax(z, axis=-1) * labels).sum(axis=1).mean()


def reference_spatial_ce(q, kmat, col_ids, gt, nbr, alphas, scale):
    """Plain-XLA reference implementation of fused_spatial_ce (for tests)."""
    z = (q.astype(jnp.float32) @ kmat.astype(jnp.float32).T) * scale
    gt_ids = col_ids[gt]
    labels = (col_ids[None, :] == gt_ids[:, None]).astype(jnp.float32)
    a = jnp.maximum(alphas, 0.0)
    for j in range(nbr.shape[1]):
        labels = labels + (col_ids[None, :] == nbr[:, j:j + 1]).astype(jnp.float32) * a[:, j:j + 1]
    labels = labels / jnp.maximum(labels.sum(axis=1, keepdims=True), 1e-12)
    return -(jax.nn.log_softmax(z, axis=-1) * labels).sum(axis=1)
