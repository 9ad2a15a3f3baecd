"""Multi-process worker for tests/test_multiprocess.py.

Each OS process runs this script with ``process_id num_processes port
out_dir``; the parent sets XLA_FLAGS for 2 local CPU devices. Exercises the
reference's multi-node surface on the JAX runtime (ref:
src/open_clip_train/distributed.py:54-90 env-based init ->
jax.distributed.initialize; tests/test_train.py:65-77 2-process DDP sim):

1. jax.distributed.initialize with an explicit coordinator (CPU backend)
2. hybrid DCN mesh (replica axis across processes, data axis within)
3. broadcast_object run-name sync + all_gather_object
4. per-host checkpoint-writer gating (only process 0 writes)
5. one spatial-loss train step with the batch sharded over ALL devices of
   both processes (gradient all-reduce crosses the process boundary)
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], Path(sys.argv[4])
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 2 * nproc

    import numpy as np

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.parallel.mesh import (
        all_gather_object,
        broadcast_object,
        make_hybrid_mesh,
    )
    from spatial_clip_tpu.train.checkpoints import CheckpointManager
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    # -- hybrid mesh: replica (DCN/process) x data (intra-process) ---------
    mesh = make_hybrid_mesh(n_slices=nproc)
    assert dict(mesh.shape) == {"replica": nproc, "data": 2}, mesh.shape
    # outer axis groups by process: row i must be process i's devices
    dev_grid = np.asarray(mesh.devices)
    for s in range(nproc):
        assert all(d.process_index == s for d in dev_grid[s].ravel())

    # -- object collectives ------------------------------------------------
    name = broadcast_object("run-%d" % pid if pid == 0 else None, src=0)
    assert name == "run-0", name
    gathered = all_gather_object(("proc", pid))
    assert gathered == [("proc", i) for i in range(nproc)], gathered

    # -- checkpoint writer gating -----------------------------------------
    ckpt_dir = out_dir / "ckpts"
    mgr = CheckpointManager(ckpt_dir, keep=1, async_save=False)
    mgr.save({"w": np.ones(3, np.float32)}, step=1)
    all_gather_object("ckpt-barrier")  # writer finished before anyone lists
    wrote = sorted(f.name for f in ckpt_dir.glob("*"))

    # -- cross-process spatial train step ---------------------------------
    bundle = create_model(
        "ViT-Test", precision="fp32", seed=0,
        vision_cfg={"image_size": 32, "patch_size": 8, "width": 64,
                    "layers": 2, "heads": 2},
        text_cfg={"context_length": 8, "vocab_size": 64, "width": 32,
                  "heads": 2, "layers": 2},
    )
    trainer = Trainer(
        bundle,
        loss=make_loss("spatial", cap_logit_scale=50.0),
        config=TrainerConfig(warmup_steps=1, total_steps=10, augment=False,
                             log_every=10**9, seed=0),
        mesh=mesh,
    )
    step = trainer.make_train_step()
    state = trainer.init_state()
    B = 8  # 2 rows per device over 4 devices
    rng = np.random.default_rng(0)  # identical global batch on every process
    tid = np.arange(B, dtype=np.int32)
    batch = trainer._device_batch({
        "images": rng.integers(0, 255, (B, 32, 32, 3), dtype=np.uint8),
        "texts": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "image_tile_ids": tid, "text_tile_ids": tid,
        "neighbor_tile_ids": rng.integers(-1, B, (B, 3)).astype(np.int32),
        "neighbor_alphas": rng.uniform(0, 1, (B, 3)).astype(np.float32),
    })
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        losses.append(float(np.asarray(metrics["loss"])))

    (out_dir / f"result_{pid}.json").write_text(json.dumps({
        "pid": pid,
        "losses": losses,
        "grad_norm": float(np.asarray(metrics["grad_norm"])),
        "ckpt_files": wrote,
        "run_name": name,
    }))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
