"""Device mesh construction and sharding helpers.

Replaces the reference's process-group init ceremony
(ref: src/open_clip_train/distributed.py:116-195 — env sniffing, backend
tables, NCCL/gloo selection) with the JAX single-controller model: build a
``Mesh``, annotate shardings, let XLA place collectives on ICI (and DCN for a
second axis on multi-slice deployments).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Multi-host init (replaces distributed.py's whole env dance).

    ``jax.distributed.initialize()`` auto-discovers the coordinator on TPU
    pods; no-op on single host.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized


def make_mesh(
    axes: Sequence[str] = (DATA_AXIS,),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default is a 1-D data-parallel mesh — the reference's only parallelism
    strategy is DDP (SURVEY.md §2.7), and contrastive training is
    batch-parallel by nature. A second ``model`` axis is supported for
    tensor-sharding larger towers.
    """
    devs = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devs)] + [1] * (len(axes) - 1)
    arr = np.asarray(devs).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axes))


def make_hybrid_mesh(
    dcn_axis: str = "replica",
    ici_axes: Sequence[str] = (DATA_AXIS,),
    ici_sizes: Optional[Sequence[int]] = None,
    n_slices: Optional[int] = None,
) -> Mesh:
    """Multi-slice mesh: slow DCN axis outermost, fast ICI axes within a
    slice (the 'multi-pod data parallelism over DCN' shape, SURVEY.md §2.7).
    Falls back to a single-slice mesh when there's one slice.

    ``n_slices`` overrides slice detection — on multi-process CPU/GPU
    topologies (no ``slice_index`` attr) each *process* is the DCN island,
    so pass ``n_slices=jax.process_count()`` to place the replica axis
    across processes (exercised by tests/test_multiprocess.py).
    """
    from jax.experimental import mesh_utils

    if n_slices is None:
        n_slices = getattr(jax.devices()[0], "num_slices", 1) or 1
    per_slice = len(jax.devices()) // n_slices
    if ici_sizes is None:
        ici_sizes = [per_slice] + [1] * (len(ici_axes) - 1)
    if n_slices == 1:
        return make_mesh(axes=(dcn_axis, *ici_axes), axis_sizes=[1, *ici_sizes])
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in jax.devices()}
    if len(slice_ids) == n_slices:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=tuple(ici_sizes),
            dcn_mesh_shape=(n_slices,) + (1,) * (len(ici_sizes) - 1),
        )
    else:
        # no slice topology info (CPU multi-process): group by process so
        # the outer axis crosses the slow (inter-process) links
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.asarray(devs).reshape(
            (n_slices,) + tuple(ici_sizes)
        )
    return Mesh(devices, (dcn_axis, *ici_axes))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = DATA_AXIS) -> Dict[str, Any]:
    """Device-put a host batch with the leading dim sharded over ``axis``.

    The analogue of DistributedSampler+DDP scatter (ref: main.py:416): each
    host feeds its local slice; single-host, GSPMD splits it.
    """
    sh = batch_sharding(mesh, axis)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def local_batch_size(global_batch_size: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    n = mesh.shape[axis]
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {axis} axis size {n}"
        )
    return global_batch_size // n


def process_shard_indices(n: int) -> Tuple[int, int]:
    """Contiguous [start, stop) range of dataset indices owned by this host
    (plays the role of webdataset split_by_node, ref: data.py:328-443)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = n // pc
    start = pi * per
    stop = start + per if pi < pc - 1 else n
    return start, stop


# ---------------------------------------------------------------------------
# Host-side object collectives (ref: src/open_clip_train/distributed.py:198-218
# ``broadcast_object``/``all_gather_object``, used for run-name sync and
# resume-latest discovery, main.py:95-97,136-168). JAX equivalent: pickle the
# object into a uint8 array and move it through
# jax.experimental.multihost_utils over the DCN-connected host set.
# ---------------------------------------------------------------------------


def broadcast_object(obj: Any = None, src: int = 0) -> Any:
    """Every process returns the ``src`` process's object."""
    import pickle

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj) if jax.process_index() == src else b""
    # length first (fixed shape), then the padded payload
    n = np.asarray([len(payload)], dtype=np.int32)
    n = multihost_utils.broadcast_one_to_all(n, is_source=jax.process_index() == src)
    buf = np.zeros(int(n[0]), dtype=np.uint8)
    if jax.process_index() == src:
        buf[:] = np.frombuffer(payload, dtype=np.uint8)
    buf = multihost_utils.broadcast_one_to_all(
        buf, is_source=jax.process_index() == src
    )
    return pickle.loads(buf.tobytes())


def all_gather_object(obj: Any) -> list:
    """Return the list of every process's object, ordered by process index."""
    import pickle

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max payload size across hosts so shapes agree
    n_local = np.asarray([payload.size], dtype=np.int32)
    sizes = multihost_utils.process_allgather(n_local).reshape(-1)
    buf = np.zeros(int(sizes.max()), dtype=np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(gathered.shape[0])
    ]
