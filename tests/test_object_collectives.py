"""Host-side object collectives (ref: open_clip_train/distributed.py:198-218
broadcast_object/all_gather_object; used for run-name sync + resume-latest).

The multihost path is exercised with mocked process topology + a loopback
multihost_utils, per the reference's own CPU-simulated distributed tests.
"""
from __future__ import annotations

import numpy as np

from spatial_clip_tpu.parallel import mesh as mesh_mod


def test_single_process_fastpath():
    obj = {"name": "run_2026", "step": 7}
    assert mesh_mod.broadcast_object(obj) == obj
    assert mesh_mod.all_gather_object(obj) == [obj]


def test_broadcast_object_mocked_multihost(monkeypatch):
    """3 mocked processes: the src payload must reach everyone through the
    broadcast_one_to_all transport, including non-src processes that
    contribute no payload."""
    import jax

    payload_store = {}

    def fake_broadcast_one_to_all(x, is_source):
        # loopback transport: the source's array is what everyone receives
        if is_source:
            payload_store[x.shape] = np.asarray(x)
        return payload_store[np.asarray(x).shape]

    class FakeMultihost:
        broadcast_one_to_all = staticmethod(fake_broadcast_one_to_all)

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    obj = {"resume": "step_001200", "seed": 42}

    # source process (index 0) populates the transport...
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.broadcast_one_to_all",
        fake_broadcast_one_to_all,
    )
    out0 = mesh_mod.broadcast_object(obj, src=0)
    assert out0 == obj

    # ...then a non-source process receives the same object without having it
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    out1 = mesh_mod.broadcast_object(None, src=0)
    assert out1 == obj


def test_all_gather_object_mocked_multihost(monkeypatch):
    """2 mocked processes with different payload sizes: padding + per-process
    truncation must reconstruct each object exactly."""
    import jax
    import pickle

    objs = [{"host": 0, "paths": ["a"]}, {"host": 1, "note": "longer payload x"}]
    payloads = [np.frombuffer(pickle.dumps(o), dtype=np.uint8) for o in objs]
    sizes = np.array([[p.size] for p in payloads], dtype=np.int32)
    maxlen = int(sizes.max())
    stacked = np.zeros((2, maxlen), dtype=np.uint8)
    for i, p in enumerate(payloads):
        stacked[i, : p.size] = p

    calls = {"n": 0}

    def fake_allgather(x):
        calls["n"] += 1
        return sizes if x.dtype == np.int32 else stacked

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather", fake_allgather
    )
    out = mesh_mod.all_gather_object(objs[0])
    assert out == objs
    assert calls["n"] == 2  # sizes round + payload round
