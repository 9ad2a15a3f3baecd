"""Parameter sharding rules for tensor parallelism over a 'model' mesh axis.

The reference's only parallelism is DDP (SURVEY.md §2.7); this module adds
the TPU-native extra: Megatron-style sharding of the transformer weights over
a second mesh axis, expressed purely as GSPMD ``NamedSharding`` annotations —
XLA partitions the matmuls and inserts the reduce-scatters/all-gathers.

Rules (d = width):
- fused QKV kernel (d, 3d)   -> shard OUTPUT dim  ('model' on axis 1)
- attn out kernel (d, d)     -> shard INPUT dim   (row-parallel)
- MLP c_fc kernel (d, 4d)    -> shard OUTPUT dim  (column-parallel)
- MLP c_proj kernel (4d, d)  -> shard INPUT dim   (row-parallel)
- token embedding (V, d)     -> shard VOCAB dim
- everything else            -> replicated
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: Tuple[str, ...], leaf, model_axis: str, size: int):
    name = "/".join(str(p) for p in path)
    shape = getattr(leaf, "shape", ())

    def ok(dim):  # only shard dims divisible by the axis size
        return len(shape) > dim and shape[dim] % size == 0

    if name.endswith("attn/qkv/kernel") and ok(1):
        return P(None, model_axis)
    if name.endswith("attn/out/kernel") and ok(0):
        return P(model_axis, None)
    if name.endswith("mlp/c_fc/kernel") and ok(1):
        return P(None, model_axis)
    if name.endswith("mlp/c_proj/kernel") and ok(0):
        return P(model_axis, None)
    if name.endswith("token_embedding/embedding") and ok(0):
        return P(model_axis, None)
    return P()


def infer_param_shardings(params: Any, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree matching ``params`` (replicated over 'data')."""
    size = mesh.shape.get(model_axis, 1)

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        spec = _spec_for(path, tree, model_axis, size) if size > 1 else P()
        return NamedSharding(mesh, spec)

    return walk(params, ())


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model"):
    shardings = infer_param_shardings(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
