"""Multi-process (2 OS processes) correctness evidence.

The reference exercises real 2-process DDP in CI (ref: tests/
test_train.py:65-77 via torch.distributed + ddp_sim); the JAX analogue is
``jax.distributed.initialize`` + a hybrid DCN mesh. Each worker
(tests/helpers/mp_worker.py) runs the full surface: distributed init,
replica-axis mesh across processes, object collectives, checkpoint-writer
gating, and a spatial-loss train step whose gradient all-reduce crosses
the process boundary.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "helpers" / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_hybrid_mesh_training(tmp_path):
    nproc = 2
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("SPATIAL_CLIP_TEST_TPU", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = [
        json.loads((tmp_path / f"result_{pid}.json").read_text())
        for pid in range(nproc)
    ]
    # run-name sync: both adopted process 0's name
    assert all(r["run_name"] == "run-0" for r in results)
    # both processes computed identical global losses (same global batch,
    # grads all-reduced across the process boundary)
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-5)
    assert results[0]["losses"][1] < results[0]["losses"][0] + 1.0
    assert np.isfinite(results[0]["grad_norm"])
    # checkpoint-writer gating: exactly ONE process wrote (both saw the
    # same dir listing because save() is process-0-gated)
    assert results[0]["ckpt_files"] == results[1]["ckpt_files"]
    assert len(results[0]["ckpt_files"]) > 0
