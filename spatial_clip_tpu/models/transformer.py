"""ViT and text transformer towers, TPU-first (flax.linen).

Functional re-design of the reference towers (ref: src/open_clip/transformer.py:
Attention :92, ResidualAttentionBlock :238, Transformer :457, VisionTransformer
:583, TextTransformer :947, text_global_pool :921, PatchDropout :48).

TPU notes:
- params are fp32, compute is bf16 by default (``dtype``); softmax and
  LayerNorm statistics accumulate in fp32.
- attention QKV is a single fused projection so the per-block weights form one
  large MXU matmul (and map 1:1 onto torch ``attn.in_proj_weight`` for
  checkpoint conversion, see models/convert.py).
- all shapes are static; pooling variants are compile-time branches.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any




# 2D-GEMM projections: XLA's 3D (B,L,N) dot lowering prefers an L-major
# {2,0,1} output layout, which forces a full-activation relayout copy at
# every Pallas custom-call boundary ({2,1,0} pinned) — the profiled
# copy/copy_add families. A 2D (B*L, N) dot emits row-major {1,0}, whose
# reshape to (B,L,N){2,1,0} is a free bitcast (verified: the layer-level
# HLO loses the 59MB qkv relayout). MEASURED NEGATIVE at model level
# (+15 ms/step, reports/ab_d2_r2.json): the 3D b0f conv lowering is itself
# that much faster than the equivalent 2D GEMM — the relayout copies are
# cheaper than the GEMM slowdown. Ships off as a reproducible knob.
DENSE_2D = False

# int8-forward training GEMMs (ops/int8_train): every %128-shaped projection
# routed through _dense/_apply_dense runs its FORWARD as an int8 x int8 MXU
# dot (per-row activation scales, per-channel weight scales) with a bf16
# straight-through backward — the v5e MXU's 2x int8 rate applied to training,
# a lever the torch reference (bnb inference-only int8) never had. Off by
# default pending the quality gate; flip per-process via the env knob or the
# '^i8' A/B arm suffix (scripts/ab_step_time.py).
import os as _os

INT8_GEMM = _os.environ.get("SPATIAL_CLIP_INT8_GEMM", "0") == "1"


def _int8_ok(K: int, N: int) -> bool:
    return INT8_GEMM and K % 128 == 0 and N % 128 == 0


def _dense(features, dtype, name, x):
    if _int8_ok(x.shape[-1], features):
        from spatial_clip_tpu.ops.int8_train import int8_matmul

        # _DenseParams shares nn.Dense's param tree (kernel/bias) + inits,
        # so checkpoints are unaffected by the knob.
        k, b = _DenseParams(x.shape[-1], features, name=name)()
        return int8_matmul(x, k, dtype) + b.astype(dtype)
    if DENSE_2D and x.ndim > 2:
        shape = x.shape
        y = nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                     name=name)(x.reshape(-1, shape[-1]))
        return y.reshape(shape[:-1] + (features,))
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    name=name)(x)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP's sigmoid-approx GELU (x * sigmoid(1.702 x))."""
    return x * jax.nn.sigmoid(1.702 * x)


def _apply_dense(kernel, bias, x, dtype):
    """nn.Dense-equivalent application of explicit (kernel, bias) params:
    promote everything to ``dtype`` then one dot + bias add (honors the
    DENSE_2D / INT8_GEMM experiment knobs exactly like :func:`_dense`)."""
    if kernel.ndim == 2 and _int8_ok(kernel.shape[0], kernel.shape[1]):
        from spatial_clip_tpu.ops.int8_train import int8_matmul

        return int8_matmul(x, kernel, dtype) + bias.astype(dtype)
    k = kernel.astype(dtype)
    b = bias.astype(dtype)
    if DENSE_2D and x.ndim > 2:
        shape = x.shape
        y = x.reshape(-1, shape[-1]).astype(dtype) @ k + b
        return y.reshape(shape[:-1] + (k.shape[1],))
    return x.astype(dtype) @ k + b


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype.

    Params are created flat (``scale``/``bias``) so torch checkpoints map
    directly (``ln_x.weight -> scale``, see models/convert.py).

    ``stats_dtype='compute'`` keeps the mean/var reductions in the compute
    dtype — an opt-in bandwidth experiment (the profiled convert_reduce
    family is the dtype-converting LN/softmax reductions); quality must be
    gated via the synthetic A/B before enabling in a flagship config.
    """

    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    # fp32 | onepass | compute | pallas (single-pass Pallas kernel with
    # one-pass fp32 stats + in-kernel dgamma/dbeta accumulation — targets
    # XLA's far-from-floor LN backward; falls back to onepass math off-TPU
    # shapes, ops/fused_ln.py)
    stats_dtype: str = "fp32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if self.stats_dtype == "pallas" and dim % 128 == 0:
            from spatial_clip_tpu.ops.fused_ln import fused_layer_norm

            shape = x.shape
            y = fused_layer_norm(
                x.reshape(-1, dim).astype(self.dtype), scale[None],
                bias[None], self.eps, jax.default_backend() != "tpu",
            )
            return y.reshape(shape)
        if self.stats_dtype == "dotstats":
            mean, m2 = _dot_stats(x.astype(self.dtype), dim)
            var = jnp.maximum(m2 - mean * mean, 0.0)
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
            y = y * scale + bias
            return y.astype(self.dtype)
        acc = self.dtype if self.stats_dtype == "compute" else jnp.float32
        xa = x.astype(acc)
        mean = xa.mean(axis=-1, keepdims=True)
        if self.stats_dtype == "onepass":
            # E[x^2]-E[x]^2: both reductions read x in ONE fused pass (XLA
            # sibling-reduce fusion) instead of the two-pass (x-mean)^2 walk
            # — targets the profiled convert_reduce family. fp32 accumulation
            # keeps the cancellation benign for bf16-scale activations.
            m2 = (xa * xa).mean(axis=-1, keepdims=True)
            var = jnp.maximum(m2 - mean * mean, 0.0)
        else:
            var = jnp.square(xa - mean).mean(axis=-1, keepdims=True)
        y = (xa - mean) * jax.lax.rsqrt(var + self.eps) * scale.astype(acc) + bias.astype(acc)
        return y.astype(self.dtype)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree layout (kernel/bias) so
    fused kernels can consume the weights without changing checkpoints."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter holder with LayerNorm's exact tree layout (scale/bias) so
    the fused LN->GEMM kernel can consume them without changing checkpoints."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias




def _dot_stats(x, dim):
    """Row mean and mean-of-squares via (.., D) x (D, 8) MXU dots instead of
    VPU lane reductions (the profiled LN-stat fusions run at 3.7x their read
    floor). bf16 squaring error averages out over D lanes (~0.015% on the
    sum), and the dots accumulate in fp32."""
    ones8 = jnp.zeros((dim, 8), x.dtype).at[:, 0].set(1.0)
    nd = x.ndim - 1
    s1 = jax.lax.dot_general(
        x, ones8, (((nd,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[..., :1]
    s2 = jax.lax.dot_general(
        x * x, ones8, (((nd,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., :1]
    return s1 / dim, s2 / dim


def _ln_apply(x, scale, bias, eps, dtype, stats_dtype="fp32"):
    """Functional LayerNorm (same math as the LayerNorm module) for paths
    where the fused LN->GEMM kernel does not apply."""
    if stats_dtype == "dotstats":
        mean, m2 = _dot_stats(x.astype(dtype), x.shape[-1])
        var = jnp.maximum(m2 - mean * mean, 0.0)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale + bias
        return y.astype(dtype)
    if stats_dtype == "pallas" and x.shape[-1] % 128 == 0:
        from spatial_clip_tpu.ops.fused_ln import fused_layer_norm

        shape = x.shape
        y = fused_layer_norm(
            x.reshape(-1, shape[-1]).astype(dtype), scale[None], bias[None],
            eps, jax.default_backend() != "tpu",
        )
        return y.reshape(shape)
    acc = dtype if stats_dtype == "compute" else jnp.float32
    xa = x.astype(acc)
    mean = xa.mean(axis=-1, keepdims=True)
    if stats_dtype == "onepass":
        m2 = (xa * xa).mean(axis=-1, keepdims=True)
        var = jnp.maximum(m2 - mean * mean, 0.0)
    else:
        var = jnp.square(xa - mean).mean(axis=-1, keepdims=True)
    y = (xa - mean) * jax.lax.rsqrt(var + eps) * scale.astype(acc) + bias.astype(acc)
    return y.astype(dtype)


def _fused_ln_ok(K: int, N: int) -> bool:
    """Shape gate for the fused LN->GEMM kernel: Mosaic-aligned dims and a
    VMEM-resident weight (<=7 MB bf16 leaves room for double-buffered tiles)."""
    return K % 128 == 0 and N % 128 == 0 and K * N * 2 <= 7 * 2 ** 20


class _Int8DenseParams(nn.Module):
    """Inference-only int8 projection params ({q8, scale, bias}; produced by
    quantize.convert_tree_mlp_int8 from a dense checkpoint)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        q8 = self.param(
            "q8", nn.initializers.zeros,
            (self.in_features, self.features), jnp.int8,
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return q8, scale, bias


class MLP(nn.Module):
    width: int
    hidden: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.gelu
    # dense | pallas (fused fc->gelu->proj kernel) | int8 (serving path:
    # int8 x int8 MXU dot_general over quantized weights, models/quantize.py)
    impl: str = "dense"

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln=None) -> jnp.ndarray:
        if self.impl == "int8":
            from spatial_clip_tpu.models.quantize import int8_dot

            if ln is not None:
                x = _ln_apply(x, ln[0], ln[1], ln[2], self.dtype)
            fc = _Int8DenseParams(x.shape[-1], self.hidden, name="c_fc")()
            pj = _Int8DenseParams(self.hidden, self.width, name="c_proj")()
            h = self.act(int8_dot(x, fc[0], fc[1]) + fc[2])
            return (int8_dot(h, pj[0], pj[1]) + pj[2]).astype(self.dtype)
        if ln is not None:
            # pre-LN fused into the fc projection (ops/fused_ln_dense):
            # ln = (scale, bias, eps); x is the raw residual-stream input.
            scale, bias, eps = ln
            if _fused_ln_ok(x.shape[-1], self.hidden):
                from spatial_clip_tpu.ops.fused_ln_dense import fused_ln_dense

                fc_k, fc_b = _DenseParams(x.shape[-1], self.hidden, name="c_fc")()
                shape = x.shape
                h = fused_ln_dense(
                    x.reshape(-1, shape[-1]).astype(self.dtype),
                    scale, bias, fc_k, fc_b, eps,
                    jax.default_backend() != "tpu",
                )
                h = self.act(h.reshape(shape[:-1] + (self.hidden,)))
                return nn.Dense(
                    self.width, dtype=self.dtype, param_dtype=jnp.float32,
                    name="c_proj",
                )(h)
            x = _ln_apply(x, scale, bias, eps, self.dtype)
        use_pallas = (
            self.impl == "pallas"
            and self.act is nn.gelu
            and self.hidden % 512 == 0
            and x.shape[-1] % 128 == 0
        )
        if use_pallas:
            from spatial_clip_tpu.ops.fused_mlp import fused_mlp

            fc_k, fc_b = _DenseParams(x.shape[-1], self.hidden, name="c_fc")()
            pj_k, pj_b = _DenseParams(self.hidden, self.width, name="c_proj")()
            shape = x.shape
            flat = x.reshape(-1, shape[-1])
            out = fused_mlp(
                flat.astype(self.dtype),
                fc_k, fc_b, pj_k, pj_b,
                interpret=jax.default_backend() != "tpu",
            )
            return out.reshape(shape[:-1] + (self.width,))
        x = _dense(self.hidden, self.dtype, "c_fc", x)
        x = self.act(x)
        x = _dense(self.width, self.dtype, "c_proj", x)
        return x


class MultiHeadAttention(nn.Module):
    """Fused-QKV multi-head attention.

    Mirrors the semantics of ref transformer.py:92-213 (incl. optional
    additive attention mask). ``impl='xla'`` (default) routes through
    ``jax.nn.dot_product_attention`` so XLA emits its fused attention
    (one pass, no materialized (B,H,L,L) probs in HBM); ``impl='einsum'``
    is the explicit fp32-softmax formulation.
    """

    width: int
    heads: int
    dtype: Dtype = jnp.float32
    impl: str = "einsum"
    qk_norm: bool = False  # ref: transformer.py:98,126 — LN over head_dim
    scaled_cosine: bool = False  # ref: transformer.py:99,134 — cosine attn

    def setup(self):
        # setup-based (not @nn.compact) so the zipped dual-tower path can
        # drive project_qkv/out_proj as separate stages around ONE shared
        # attention custom call per layer pair (see CLIP.encode_pair).
        # Param tree is identical to the historical compact version: the
        # "qkv"/"out" scopes come from these attribute names, and
        # _DenseParams shares nn.Dense's kernel/bias layout + inits.
        assert not (self.qk_norm and self.scaled_cosine)
        self.qkv = _DenseParams(self.width, 3 * self.width)
        self.out = _DenseParams(self.width, self.width)
        if self.qk_norm:
            self.ln_q = LayerNorm(dtype=self.dtype)
            self.ln_k = LayerNorm(dtype=self.dtype)
        if self.scaled_cosine:
            self.logit_scale = self.param(
                "logit_scale",
                nn.initializers.constant(jnp.log(10.0)),
                (self.heads, 1, 1),
                jnp.float32,
            )

    def project_qkv(self, x: jnp.ndarray) -> jnp.ndarray:
        """The fused qkv projection alone (zip-path stage 1)."""
        kernel, bias = self.qkv()
        return _apply_dense(kernel, bias, x, self.dtype)

    def out_proj(self, ctx: jnp.ndarray) -> jnp.ndarray:
        """The output projection alone (zip-path stage 3)."""
        kernel, bias = self.out()
        return _apply_dense(kernel, bias, ctx, self.dtype)

    def __call__(
        self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None, ln=None
    ) -> jnp.ndarray:
        B, L, D = x.shape
        assert D == self.width, (D, self.width)
        head_dim = self.width // self.heads
        impl = self.impl
        if impl == "auto":
            # pallas3 (projection-fused VJP + in-kernel bias grad, see
            # BWD_FUSE) over plain pallas: identical forward, but the
            # backward consumes the kernel's (3,B,L,D) cotangent directly —
            # the (B,L,3D) dqkv DUS-concat chain (~1.6 ms/step at ViT-B) and
            # the standalone db reduce (~1.1 ms) never materialize. Measured
            # -0.51 ms/step on the parity config (reports/ab_pallas3_r3s6).
            if jax.default_backend() == "tpu":
                # INT8_GEMM needs the qkv GEMM OUTSIDE the attention custom
                # VJP (pallas3 owns it); plain 'pallas' projects via
                # _apply_dense, which routes to the int8 MXU dot.
                impl = "pallas" if INT8_GEMM else "pallas3"
            else:
                impl = "einsum"
        if ln is not None:
            # pre-LN handed in for fusion with the qkv projection
            # (ops/fused_ln_dense). Fusable only on the Pallas attention
            # paths with supported geometry; otherwise apply it here.
            from spatial_clip_tpu.ops import fused_attention as fa

            fusable = (
                impl in ("pallas", "pallas_inter")
                and not (self.qk_norm or self.scaled_cosine)
                and fa.supported(self.heads, self.width)
                and _fused_ln_ok(D, 3 * self.width)
                and (attn_mask is None
                     or all(s == 1 for s in attn_mask.shape[:-2]))
            )
            if not fusable:
                x = _ln_apply(x, ln[0], ln[1], ln[2], self.dtype)
                ln = None
        if impl in ("fold", "fold_bf16") and not (
            self.qk_norm or self.scaled_cosine
        ):
            return self._fold_attention(x, attn_mask)
        if ln is not None:
            from spatial_clip_tpu.ops import fused_attention as fa
            from spatial_clip_tpu.ops.fused_ln_dense import fused_ln_dense

            scale_p, bias_p, eps = ln
            mask2d = None
            if attn_mask is not None:
                mask2d = attn_mask.reshape(attn_mask.shape[-2:])
            kernel, bias = self.qkv()
            interleaved = impl == "pallas_inter"
            if interleaved:
                perm = tuple(fa.interleave_perm(self.heads, head_dim))
                inv = fa.inverse_perm(perm)
                kernel = fa.permute_columns(kernel, perm, inv)
                bias = fa.permute_columns(bias[None, :], perm, inv)[0]
            interp = jax.default_backend() != "tpu"
            qkv = fused_ln_dense(
                x.reshape(-1, D).astype(self.dtype),
                scale_p, bias_p, kernel, bias, eps, interp,
            ).reshape(B, L, 3 * self.width)
            ctx = fa.fused_attention(qkv, mask2d, self.heads, interp, interleaved)
            return self.out_proj(ctx)
        if impl == "pallas_inter":
            # Interleaved-layout fused attention: the qkv projection weight's
            # columns are statically permuted so each head group's q|k|v
            # lanes are contiguous — the kernel DMAs one contiguous block
            # per grid step and the backward emits dqkv as a single write
            # (no XLA concatenate / dynamic-update-slice family). The param
            # tree keeps the standard [q|k|v] order, so checkpoints are
            # unaffected; the (D,3D) weight gather folds into XLA's fusions.
            from spatial_clip_tpu.ops import fused_attention as fa

            mask2d = None
            ok = fa.supported(self.heads, self.width) and not (
                self.qk_norm or self.scaled_cosine
            )
            if attn_mask is not None:
                lead = attn_mask.shape[:-2]
                if all(s == 1 for s in lead):
                    mask2d = attn_mask.reshape(attn_mask.shape[-2:])
                else:
                    ok = False
            if ok:
                kernel, bias = self.qkv()
                perm = tuple(fa.interleave_perm(self.heads, head_dim))
                inv = fa.inverse_perm(perm)
                qkv_i = (
                    x @ fa.permute_columns(kernel, perm, inv).astype(self.dtype)
                    + fa.permute_columns(bias[None, :], perm, inv)[0].astype(self.dtype)
                )
                ctx = fa.fused_attention(
                    qkv_i, mask2d, self.heads,
                    jax.default_backend() != "tpu", True,
                )
                return self.out_proj(ctx)
            impl = "einsum"
        if impl == "pallas_t":
            # Transposed-input fused attention: the kernel consumes the
            # logically transposed no-bias qkv GEMM output — whose required
            # {2,1,0} layout is exactly the GEMM's natural physical bytes,
            # so no relayout copy or separate bias-add pass survives (the
            # bias folds into the kernel; see ops/fused_attention.py).
            from spatial_clip_tpu.ops import fused_attention as fa

            mask2d = None
            ok = fa.supported(self.heads, self.width) and not (
                self.qk_norm or self.scaled_cosine
            )
            if attn_mask is not None:
                lead = attn_mask.shape[:-2]
                if all(s == 1 for s in lead):
                    mask2d = attn_mask.reshape(attn_mask.shape[-2:])
                else:
                    ok = False
            if ok:
                kernel, bias = self.qkv()
                qkv_nb = x.astype(self.dtype) @ kernel.astype(self.dtype)
                ctx = fa.fused_attention_t(
                    qkv_nb, bias[None].astype(self.dtype), mask2d, self.heads,
                    jax.default_backend() != "tpu",
                )
                return self.out_proj(ctx)
            impl = "einsum"
        if impl == "pallas3":
            # Projection-fused attention (ops/fused_attention.qkv_attention):
            # identical forward to 'pallas' (one fused GEMM -> group kernel),
            # but the qkv GEMM lives inside the kernel's custom VJP so the
            # backward consumes the kernel's (3,B,L,D) cotangent directly —
            # the (B,L,3D) dqkv concatenate never materializes. Same "qkv"
            # param tree; checkpoints unaffected.
            from spatial_clip_tpu.ops import fused_attention as fa

            mask2d = None
            ok = fa.supported(self.heads, self.width) and not (
                self.qk_norm or self.scaled_cosine
            )
            if attn_mask is not None:
                lead = attn_mask.shape[:-2]
                if all(s == 1 for s in lead):
                    mask2d = attn_mask.reshape(attn_mask.shape[-2:])
                else:
                    ok = False
            if ok:
                kernel, bias = self.qkv()
                ctx = fa.qkv_attention(
                    x.astype(self.dtype), kernel, bias, mask2d, self.heads,
                    jax.default_backend() != "tpu",
                )
                return self.out_proj(ctx)
            impl = "einsum"
        if impl == "pallas_split":
            # Split-projection attention: three slice-GEMMs of the SAME
            # stored (D, 3D) qkv weight (checkpoint tree unchanged), kernel
            # consumes q/k/v as separate arrays, and the VJP returns
            # dq/dk/dv separately — the (B,L,3D) dqkv concat (a
            # dynamic-update-slice chain in HLO, ~1.6 ms/step at ViT-B)
            # never exists. See ops/fused_attention.fused_attention_split.
            from spatial_clip_tpu.ops import fused_attention as fa

            mask2d = None
            ok = fa.supported(self.heads, self.width) and not (
                self.qk_norm or self.scaled_cosine
            )
            if attn_mask is not None:
                lead = attn_mask.shape[:-2]
                if all(s == 1 for s in lead):
                    mask2d = attn_mask.reshape(attn_mask.shape[-2:])
                else:
                    ok = False
            if ok:
                kernel, bias = self.qkv()
                W = self.width
                parts = [
                    _apply_dense(kernel[:, t * W:(t + 1) * W],
                                 bias[t * W:(t + 1) * W], x, self.dtype)
                    for t in range(3)
                ]
                ctx = fa.fused_attention_split(
                    parts[0], parts[1], parts[2], mask2d, self.heads,
                    jax.default_backend() != "tpu",
                )
                return self.out_proj(ctx)
            impl = "einsum"
        qkv = self.project_qkv(x)
        if impl == "pallas":
            # Fused Pallas attention: consumes the raw (B,L,3D) qkv GEMM
            # output, head-splitting via BlockSpec index maps — no 4D
            # head-split arrays (and no layout copies) ever hit HBM.
            # Arbitrary-batch masks / unsupported head geometry fall back
            # to einsum below.
            from spatial_clip_tpu.ops import fused_attention as fa

            mask2d = None
            ok = fa.supported(self.heads, self.width) and not (
                self.qk_norm or self.scaled_cosine
            )
            if attn_mask is not None:
                lead = attn_mask.shape[:-2]
                if all(s == 1 for s in lead):
                    mask2d = attn_mask.reshape(attn_mask.shape[-2:])
                else:
                    ok = False
            if ok:
                ctx = fa.fused_attention(
                    qkv, mask2d, self.heads,
                    jax.default_backend() != "tpu",
                )
                return self.out_proj(ctx)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(B, L, self.heads, head_dim)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        if self.qk_norm:
            q = self.ln_q(q)
            k = self.ln_k(k)
        if self.scaled_cosine:
            # cosine attention with learnable per-head temperature
            q = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-6).astype(self.dtype)
            k = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-6).astype(self.dtype)
            scale_per_head = jnp.exp(jnp.minimum(self.logit_scale, jnp.log(100.0)))
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            attn = attn * scale_per_head[None]
            if attn_mask is not None:
                attn = attn + attn_mask.astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, self.width)
            return self.out_proj(out)
        if impl == "xla":
            bias = None
            if attn_mask is not None:
                bias = jnp.broadcast_to(
                    attn_mask.astype(q.dtype), (1, self.heads, L, L)
                )
            out = jax.nn.dot_product_attention(q, k, v, bias=bias)
            out = out.reshape(B, L, self.width)
        else:
            scale = head_dim ** -0.5
            # 'einsum' keeps fp32 softmax stats; 'einsum_bf16' runs the whole
            # attention in compute dtype (opt-in; ~bandwidth win, small
            # numerics change at seq<=77)
            acc = self.dtype if impl == "einsum_bf16" else jnp.float32
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k).astype(acc)
            if attn_mask is not None:
                attn = attn + attn_mask.astype(acc)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, self.width)
        return self.out_proj(out)

    def _fold_attention(
        self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Layout-copy-free attention.

        The round-1 HLO profile attributed ~15% of device time to layout
        copies at the q/k/v ``(B,L,D)->(B,L,H,hd)`` reshapes (3 fwd + 3 bwd
        per block): on TPU the 4D head-split layout pads hd=64 lanes to 128,
        so each reshape is a physical relayout. Here q/k/v are *projected
        directly* into head-split ``(B,H,L,hd)`` form by folding the reshape
        into the projection einsum, and the output projection contracts
        ``(h, d)`` in one dot — no activation reshape ops exist anywhere, so
        XLA has nothing to relayout. Param tree/layout is identical to the
        Dense path (``qkv/kernel (D,3D)``, ``out/kernel (D,D)``) so
        checkpoints are unaffected.
        """
        B, L, D = x.shape
        H = self.heads
        hd = self.width // H
        qkv_k, qkv_b = self.qkv()
        out_k, out_b = self.out()
        w = qkv_k.reshape(D, 3, H, hd).astype(self.dtype)
        b = qkv_b.reshape(3, H, hd).astype(self.dtype)
        # (3, B, H, L, hd) straight out of one dot_general; the t/h axes are
        # major so the q/k/v slices below are free.
        qkv = jnp.einsum("bld,dthk->tbhlk", x, w) + b[:, None, :, None, :]
        q, k, v = qkv[0], qkv[1], qkv[2]
        acc = self.dtype if self.impl == "fold_bf16" else jnp.float32
        scale = hd ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(acc)
        if attn_mask is not None:
            attn = attn + attn_mask.astype(acc)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        wo = out_k.reshape(H, hd, self.width).astype(self.dtype)
        return jnp.einsum("bhqd,hdD->bqD", out, wo) + out_b.astype(self.dtype)


class ResidualBlock(nn.Module):
    """Pre-LN transformer block with optional layer-scale
    (ref: transformer.py:238-301 ``ResidualAttentionBlock``)."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Callable = nn.gelu
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"
    qk_norm: bool = False
    scaled_cosine: bool = False
    ln_stats: str = "fp32"
    # dense (LayerNorm module + Dense) | pallas (fused LN->GEMM kernel for
    # ln_1->qkv and ln_2->fc; identical param tree, ops/fused_ln_dense)
    ln_gemm_impl: str = "dense"

    def _fuse_ln(self) -> bool:
        # ln_stats='pallas' routes through ops/fused_ln instead
        return (self.ln_gemm_impl == "pallas"
                and self.ln_stats in ("fp32", "onepass"))

    def setup(self):
        # setup-based so CLIP.encode_pair can stage attn_qkv/attn_finish
        # around ONE dual-tower attention call. Scope names (attn/ln_1/ln_2/
        # mlp/ls_1/ls_2) match the historical compact version exactly.
        if self._fuse_ln():
            self.ln_1 = _LNParams(self.width)
            self.ln_2 = _LNParams(self.width)
        else:
            self.ln_1 = LayerNorm(eps=self.norm_eps, dtype=self.dtype,
                                  stats_dtype=self.ln_stats)
            self.ln_2 = LayerNorm(eps=self.norm_eps, dtype=self.dtype,
                                  stats_dtype=self.ln_stats)
        self.attn = MultiHeadAttention(
            width=self.width, heads=self.heads, dtype=self.dtype,
            impl=self.attn_impl, qk_norm=self.qk_norm,
            scaled_cosine=self.scaled_cosine,
        )
        self.mlp = MLP(
            width=self.width,
            hidden=int(self.width * self.mlp_ratio),
            dtype=self.dtype,
            act=self.act,
            impl=self.mlp_impl,
        )
        if self.ls_init_value is not None:
            self.ls_1 = self.param(
                "ls_1", nn.initializers.constant(self.ls_init_value),
                (self.width,), jnp.float32,
            )
            self.ls_2 = self.param(
                "ls_2", nn.initializers.constant(self.ls_init_value),
                (self.width,), jnp.float32,
            )
        else:
            self.ls_1 = None
            self.ls_2 = None

    def _scaled(self, y, gamma):
        return y if gamma is None else y * gamma.astype(self.dtype)

    def attn_qkv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zip-path stage 1: pre-LN + fused qkv projection. Caller (the
        zipped dual-tower driver) guarantees a standard block: no qk-norm /
        scaled-cosine / fused-LN."""
        return self.attn.project_qkv(self.ln_1(x))

    def attn_finish(self, x: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
        """Zip-path stage 2: out projection + residual + MLP half."""
        x = x + self._scaled(self.attn.out_proj(ctx), self.ls_1)
        h = self.mlp(self.ln_2(x))
        return x + self._scaled(h, self.ls_2)

    def __call__(
        self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if self._fuse_ln():
            s1, b1 = self.ln_1()
            h = self.attn(x, attn_mask, ln=(s1, b1, self.norm_eps))
        else:
            h = self.attn(self.ln_1(x), attn_mask)
        x = x + self._scaled(h, self.ls_1)
        if self._fuse_ln():
            s2, b2 = self.ln_2()
            h = self.mlp(x, ln=(s2, b2, self.norm_eps))
        else:
            h = self.mlp(self.ln_2(x))
        x = x + self._scaled(h, self.ls_2)
        return x


class Transformer(nn.Module):
    """A stack of residual blocks (ref: transformer.py:457-577)."""

    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Callable = nn.gelu
    remat: bool = False
    remat_policy: str = "nothing"  # nothing (full recompute) | dots (keep GEMMs)
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"
    qk_norm: bool = False
    scaled_cosine: bool = False
    ln_stats: str = "fp32"
    ln_gemm_impl: str = "dense"

    def setup(self):
        block_cls = ResidualBlock
        if self.remat:
            policy = (
                jax.checkpoint_policies.checkpoint_dots
                if self.remat_policy == "dots"
                else None
            )
            block_cls = nn.remat(ResidualBlock, static_argnums=(), policy=policy)
        # list attribute => flax scopes resblocks_0..resblocks_{n-1}, the
        # same names the compact version assigned explicitly
        self.resblocks = [
            block_cls(
                width=self.width,
                heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                act=self.act,
                attn_impl=self.attn_impl,
                mlp_impl=self.mlp_impl,
                qk_norm=self.qk_norm,
                scaled_cosine=self.scaled_cosine,
                ln_stats=self.ln_stats,
                ln_gemm_impl=self.ln_gemm_impl,
            )
            for _ in range(self.layers)
        ]

    def __call__(
        self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        for i, block in enumerate(self.resblocks):
            x = block(x, attn_mask)
            # expose per-block tokens for probing / forward_intermediates
            # (ref: model.py forward_intermediates, utils.feature_take_indices);
            # retrieved via apply(..., mutable=['intermediates'])
            self.sow("intermediates", f"block_{i}", x)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping patchify as reshape + one MXU GEMM.

    Keeps the conv's HWIO ``kernel`` param (checkpoint-compatible with
    ``visual.conv1.weight``) but avoids TPU conv lowering overhead — the
    backward pass is a plain GEMM instead of a gradient conv.
    """

    patch_size: int
    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = images.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, C, self.width),
            jnp.float32,
        )
        patches = images.astype(self.dtype).reshape(B, gh, p, gw, p, C)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        if _int8_ok(p * p * C, self.width):
            from spatial_clip_tpu.ops.int8_train import int8_matmul

            return int8_matmul(patches, kernel.reshape(p * p * C, self.width),
                               self.dtype)
        w = kernel.reshape(p * p * C, self.width).astype(self.dtype)
        return patches @ w


def sincos_2d_pos_embed(width: int, grid_h: int, grid_w: int) -> jnp.ndarray:
    """2D sin-cos positional embedding (ref: src/open_clip/pos_embed.py:20-96)."""
    assert width % 4 == 0
    quarter = width // 4

    def axis_embed(n):
        pos = jnp.arange(n, dtype=jnp.float32)
        omega = 1.0 / (10000 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
        out = jnp.einsum("p,d->pd", pos, omega)
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)  # (n, width/2)

    eh = axis_embed(grid_h)  # (H, W/2)
    ew = axis_embed(grid_w)
    grid = jnp.concatenate(
        [
            jnp.repeat(eh[:, None, :], grid_w, axis=1),
            jnp.repeat(ew[None, :, :], grid_h, axis=0),
        ],
        axis=-1,
    )  # (H, W, width)
    return grid.reshape(grid_h * grid_w, width)


class PatchDropout(nn.Module):
    """Keep a random subset of patch tokens during training
    (ref: transformer.py:48-89; FLIP-style, PAPERS.md 'Scaling ... via Masking')."""

    prob: float
    exclude_first_token: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.prob <= 0.0:
            return x
        B, L, D = x.shape
        start = 1 if self.exclude_first_token else 0
        n_tokens = L - start
        n_keep = max(1, int(n_tokens * (1.0 - self.prob)))
        rng = self.make_rng("dropout")
        # one shared permutation per batch-row; static output shape (n_keep)
        noise = jax.random.uniform(rng, (B, n_tokens))
        keep_idx = jnp.argsort(noise, axis=1)[:, :n_keep]
        tokens = jnp.take_along_axis(x[:, start:], keep_idx[:, :, None], axis=1)
        if start:
            tokens = jnp.concatenate([x[:, :1], tokens], axis=1)
        return tokens


class AttentionalPooler(nn.Module):
    """Query-based attention pooling (ref: transformer.py:215-236)."""

    d_model: int
    context_dim: int
    heads: int = 8
    n_queries: int = 256
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        query = self.param(
            "query", nn.initializers.normal(0.02), (self.n_queries, self.d_model),
            jnp.float32,
        )
        q = jnp.broadcast_to(query[None], (B, self.n_queries, self.d_model)).astype(self.dtype)
        x = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln_k")(x)
        q = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln_q")(q)
        head_dim = self.d_model // self.heads
        qp = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="q_proj")(q)
        kp = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="k_proj")(x)
        vp = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj")(x)

        def split(t, L):
            return t.reshape(B, L, self.heads, head_dim)

        qp, kp, vp = split(qp, self.n_queries), split(kp, x.shape[1]), split(vp, x.shape[1])
        attn = jnp.einsum("bqhd,bkhd->bhqk", qp * head_dim ** -0.5, kp).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(B, self.n_queries, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


class VisionTransformer(nn.Module):
    """ViT image tower (ref: transformer.py:583-918).

    Patchify is a Conv with stride=patch_size — a single large MXU matmul per
    image. Returns the pooled, projected embedding (and optionally tokens).
    """

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    ls_init_value: Optional[float] = None
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"
    final_ln_after_pool: bool = False
    pool_type: str = "tok"
    output_tokens: bool = False
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Callable = nn.gelu
    remat: bool = False
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"
    qk_norm: bool = False
    scaled_cosine: bool = False
    # 'reshape': non-overlapping patchify as reshape+matmul — a single plain
    # MXU GEMM fwd AND bwd (conv lowering pays im2col/grad-conv overhead on
    # TPU). 'conv': nn.Conv. Both share the same HWIO kernel param.
    ln_stats: str = "fp32"
    ln_gemm_impl: str = "dense"
    patchify_impl: str = "reshape"

    def _pool(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.pool_type == "avg":
            return x[:, 1:].mean(axis=1), x[:, 1:]
        if self.pool_type == "tok":
            return x[:, 0], x[:, 1:]
        return x.mean(axis=1), x  # 'none' fallback: caller handles tokens

    def setup(self):
        # setup-based (scope names unchanged) so CLIP.encode_pair can run
        # embed -> zipped blocks -> head with the text tower in lockstep.
        if self.patchify_impl == "reshape":
            self.conv1 = PatchEmbed(
                patch_size=self.patch_size,
                width=self.width,
                dtype=self.dtype,
            )
        else:
            self.conv1 = nn.Conv(
                self.width,
                kernel_size=(self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(self.width ** -0.5),
            (self.width,), jnp.float32,
        )
        if self.pos_embed_type != "sin_cos_2d":
            size = (self.image_size if isinstance(self.image_size, int)
                    else self.image_size[0])
            n_patches = (size // self.patch_size) ** 2
            self.positional_embedding = self.param(
                "positional_embedding",
                nn.initializers.normal(self.width ** -0.5),
                (n_patches + 1, self.width),
                jnp.float32,
            )
        if self.patch_dropout > 0:
            self.patch_drop = PatchDropout(prob=self.patch_dropout)
        if not self.no_ln_pre:
            self.ln_pre = LayerNorm(eps=self.norm_eps, dtype=self.dtype,
                                    stats_dtype=self.ln_stats)
        self.transformer = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            act=self.act,
            remat=self.remat,
            attn_impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
            ln_gemm_impl=self.ln_gemm_impl,
            qk_norm=self.qk_norm,
            scaled_cosine=self.scaled_cosine,
            ln_stats=self.ln_stats,
        )
        if self.attentional_pool:
            self.attn_pool = AttentionalPooler(
                d_model=self.width,
                context_dim=self.width,
                heads=self.attn_pooler_heads,
                n_queries=self.attn_pooler_queries,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
            )
        self.ln_post = LayerNorm(eps=self.norm_eps, dtype=self.dtype,
                                 stats_dtype=self.ln_stats)
        self.proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim), jnp.float32,
        )

    def embed(self, images: jnp.ndarray, deterministic: bool = True):
        """Patchify + cls/pos embed + patch dropout + pre-LN (pre-blocks)."""
        B = images.shape[0]
        if self.patchify_impl == "reshape":
            x = self.conv1(images)
        else:
            x = self.conv1(images.astype(self.dtype))
            x = x.reshape(B, -1, self.width)  # (B, grid*grid, width)
        n_patches = x.shape[1]
        cls = self.class_embedding
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, self.width)).astype(self.dtype), x],
            axis=1,
        )
        if self.pos_embed_type == "sin_cos_2d":
            g = int(n_patches ** 0.5)
            pe_grid = sincos_2d_pos_embed(self.width, g, g)
            pos = jnp.concatenate([jnp.zeros((1, self.width)), pe_grid], axis=0)
        else:
            pos = self.positional_embedding
        x = x + pos[None].astype(self.dtype)
        if self.patch_dropout > 0:
            x = self.patch_drop(x, deterministic=deterministic)
        if not self.no_ln_pre:
            x = self.ln_pre(x)
        return x

    def head(self, x: jnp.ndarray):
        """Pool + final LN + projection (post-blocks)."""
        if self.attentional_pool:
            x = self.attn_pool(x)
            pooled, tokens = x[:, 0], x[:, 1:]
            pooled = self.ln_post(pooled)
        elif self.final_ln_after_pool:
            pooled, tokens = self._pool(x)
            pooled = self.ln_post(pooled)
        else:
            x = self.ln_post(x)
            pooled, tokens = self._pool(x)
        pooled = pooled @ self.proj.astype(self.dtype)
        if self.output_tokens:
            return pooled, tokens
        return pooled

    def __call__(
        self, images: jnp.ndarray, deterministic: bool = True
    ):
        """images: (B, H, W, 3) float in model input space (NHWC, TPU-native)."""
        x = self.embed(images, deterministic=deterministic)
        x = self.transformer(x)
        return self.head(x)


def text_global_pool(
    x: jnp.ndarray, tokens: Optional[jnp.ndarray], pool_type: str
) -> jnp.ndarray:
    """Pool text features (ref: transformer.py:921-944)."""
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    if pool_type == "avg":
        return x.mean(axis=1)
    if pool_type == "argmax":
        # EOT token has the highest id in the CLIP vocab
        idx = jnp.argmax(tokens, axis=-1)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    return x.mean(axis=1)


class TextTransformer(nn.Module):
    """Causal text tower (ref: transformer.py:947-1130)."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    ls_init_value: Optional[float] = None
    embed_cls: bool = False
    no_causal_mask: bool = False
    pad_id: int = 0
    pool_type: str = "argmax"
    final_ln_after_pool: bool = False
    proj_bias: bool = False
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Callable = nn.gelu
    remat: bool = False
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"
    qk_norm: bool = False
    scaled_cosine: bool = False
    ln_stats: str = "fp32"
    ln_gemm_impl: str = "dense"

    def setup(self):
        # setup-based (scope names unchanged) for the zipped dual-tower path.
        self.token_embedding = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        seq_len = self.context_length + (1 if self.embed_cls else 0)
        if self.embed_cls:
            self.cls_emb = self.param(
                "cls_emb", nn.initializers.normal(0.01), (self.width,),
                jnp.float32,
            )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (seq_len, self.width), jnp.float32,
        )
        self.transformer = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            act=self.act,
            remat=self.remat,
            attn_impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
            ln_gemm_impl=self.ln_gemm_impl,
            qk_norm=self.qk_norm,
            scaled_cosine=self.scaled_cosine,
            ln_stats=self.ln_stats,
        )
        self.ln_final = LayerNorm(eps=self.norm_eps, dtype=self.dtype,
                                  stats_dtype=self.ln_stats)
        if self.proj_bias:
            self.text_projection = nn.Dense(
                self.output_dim, dtype=self.dtype, param_dtype=jnp.float32,
            )
        else:
            self.text_projection = self.param(
                "text_projection", nn.initializers.normal(self.width ** -0.5),
                (self.width, self.output_dim), jnp.float32,
            )

    def embed(self, text: jnp.ndarray):
        """Token + positional embedding; returns (x, 2D additive causal mask
        or None)."""
        B, L = text.shape
        x = self.token_embedding(text)
        seq_len = L
        if self.embed_cls:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(self.cls_emb[None, None],
                                     (B, 1, self.width)).astype(self.dtype)],
                axis=1,
            )
            seq_len += 1
        x = x + self.positional_embedding[None].astype(self.dtype)
        attn_mask = None
        if not self.no_causal_mask:
            neg = jnp.finfo(jnp.float32).min
            attn_mask = jnp.triu(jnp.full((seq_len, seq_len), neg), k=1)
        return x, attn_mask

    def head(self, x: jnp.ndarray, text: jnp.ndarray):
        """Final LN + pool + projection."""
        if self.embed_cls:
            pooled = x[:, -1]
            pooled = self.ln_final(pooled)
        elif self.final_ln_after_pool:
            pooled = text_global_pool(x, text, self.pool_type)
            pooled = self.ln_final(pooled)
        else:
            x = self.ln_final(x)
            pooled = text_global_pool(x, text, self.pool_type)
        if self.proj_bias:
            pooled = self.text_projection(pooled)
        else:
            pooled = pooled @ self.text_projection.astype(self.dtype)
        return pooled

    def __call__(self, text: jnp.ndarray, deterministic: bool = True):
        """text: (B, context_length) int32 token ids."""
        x, attn_mask = self.embed(text)
        if attn_mask is not None:
            attn_mask = attn_mask[None, None]
        x = self.transformer(x, attn_mask)
        return self.head(x, text)


class GeneMLPTower(nn.Module):
    """Rank-weighted gene-expression vector -> embedding MLP.

    TPU-native alternative text tower (north-star config 1): one big
    (B, num_genes) x (num_genes, width) MXU matmul + residual MLP blocks,
    instead of a token transformer over gene sentences.
    """

    num_genes: int = 5000
    width: int = 1024
    layers: int = 3
    output_dim: int = 512
    gene_dropout: float = 0.0
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    ln_stats: str = "fp32"

    @nn.compact
    def __call__(self, gene_vector: jnp.ndarray, deterministic: bool = True):
        if self.gene_dropout > 0 and not deterministic:
            # gene-masking augmentation: randomly silence genes so the tower
            # can't memorize full expression fingerprints (improves val
            # retrieval markedly at small data scale — docs/experiments.md)
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.gene_dropout, gene_vector.shape
            )
            gene_vector = jnp.where(keep, gene_vector, 0.0)
        x = nn.Dense(
            self.width, dtype=self.dtype, param_dtype=jnp.float32, name="embed"
        )(gene_vector.astype(self.dtype))
        for i in range(self.layers):
            h = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name=f"ln_{i}")(x)
            h = nn.Dense(
                self.width * 4, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"fc_{i}",
            )(h)
            h = nn.gelu(h)
            h = nn.Dense(
                self.width, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"proj_{i}",
            )(h)
            x = x + h
        x = LayerNorm(eps=self.norm_eps, dtype=self.dtype, stats_dtype=self.ln_stats, name="ln_final")(x)
        return nn.Dense(
            self.output_dim, dtype=self.dtype, param_dtype=jnp.float32, name="head"
        )(x)
