"""Weights-only int8 quantization for checkpoint distribution & serving.

The reference gates int8 behind Triton/bitsandbytes ``replace_linear``
(ref: open_clip_train/main.py:259-269, src/open_clip/utils.py:67-92). The
TPU-native equivalent here is a quantized checkpoint format: 2-D+ kernels are
stored as per-output-channel symmetric int8 with fp32 scales (4x smaller
artifacts); loading dequantizes to fp32 params (XLA fuses the dequant into
the first matmul when the dequantized tree is fed to jit). Full int8
``dot_general`` execution is a later optimization.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from spatial_clip_tpu.train.checkpoints import flatten_params, unflatten_params

_QSUFFIX = "::q8"
_SSUFFIX = "::scale"


def quantize_array(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-last-axis-channel symmetric int8 quantization."""
    x = np.asarray(x, dtype=np.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    amax = np.abs(x).max(axis=reduce_axes, keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return q, scale.reshape(-1)


def dequantize_array(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    shape = (1,) * (q.ndim - 1) + (-1,)
    return q.astype(np.float32) * scale.reshape(shape)


def save_quantized_npz(params: Dict[str, Any], path: str, min_size: int = 4096):
    """Quantize every >=2-D kernel above ``min_size`` elements; store the rest
    (biases, norms, embeddings' scales...) in fp32."""
    flat = flatten_params(params)
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if v.ndim >= 2 and v.size >= min_size and v.dtype.kind == "f":
            q, s = quantize_array(v)
            out[k + _QSUFFIX] = q
            out[k + _SSUFFIX] = s
        else:
            out[k] = v
    np.savez_compressed(path, **out)


def load_quantized_npz(path: str) -> Dict[str, Any]:
    raw = dict(np.load(path))
    flat: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        if k.endswith(_QSUFFIX):
            base = k[: -len(_QSUFFIX)]
            flat[base] = dequantize_array(v, raw[base + _SSUFFIX])
        elif k.endswith(_SSUFFIX):
            continue
        else:
            flat[k] = v
    return unflatten_params(flat)


# ---------------------------------------------------------------------------
# int8 dot_general execution (serving path)
# (ref: src/open_clip/utils.py:67-92 replace_linear + bitsandbytes
# Linear8bitLt — the TPU-native equivalent runs the MXU at its 2x int8 rate
# with per-row dynamic activation scales and per-channel weight scales.)
# ---------------------------------------------------------------------------


def int8_dot(x, w_q, w_scale):
    """``x @ dequant(w_q)`` executed as an int8 x int8 MXU ``dot_general``.

    x: (..., K) float activations — dynamically quantized per row (symmetric,
    LLM.int8-style absmax without outlier decomposition; CLIP towers have no
    outlier channels at these widths).
    w_q: (K, N) int8; w_scale: (N,) fp32 per-output-channel scales.
    Returns (..., N) fp32. Inference-only (round() has zero gradient).
    """
    import jax
    import jax.numpy as jnp

    xa = jnp.asarray(x, jnp.float32)
    xs = jnp.max(jnp.abs(xa), axis=-1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    x_q = jnp.clip(jnp.round(xa / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((xa.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * w_scale


def convert_tree_mlp_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a dense param tree for use with ``mlp_impl='int8'``: every
    transformer-MLP projection (``mlp/c_fc``, ``mlp/c_proj``) becomes
    {q8, scale, bias}; everything else is unchanged."""

    def walk(tree, under_mlp=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if under_mlp and k in ("c_fc", "c_proj") and "kernel" in v:
                    q, s = quantize_array(np.asarray(v["kernel"]))
                    out[k] = {"q8": q, "scale": s,
                              "bias": np.asarray(v["bias"])}
                else:
                    out[k] = walk(v, under_mlp=(k == "mlp"))
            else:
                out[k] = v
        return out

    return walk(params)
