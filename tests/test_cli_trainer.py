"""Standalone CLI trainer smoke (ref: the open_clip_train.main surface)."""
import json
from pathlib import Path

import numpy as np

from spatial_clip_tpu.cli import main_train


def test_parse_args_model_defaults():
    args = main_train.parse_args(["--model", "ViT-B-32"])
    assert args.lr == 5.0e-4 and args.beta2 == 0.98  # ViT defaults
    args2 = main_train.parse_args(["--model", "RN50", "--lr", "1e-3"])
    assert args2.lr == 1e-3 and args2.beta2 == 0.999  # non-ViT default


def test_cli_trainer_end_to_end(tmp_path):
    metrics = main_train.main(
        [
            "--model", "ViT-Test", "--precision", "fp32",
            "--dataset-type", "synthetic",
            "--synthetic-num-samples", "64", "--synthetic-image-size", "32",
            "--batch-size", "16", "--epochs", "1", "--steps-per-epoch", "2",
            "--use-spatial-loss", "--cap-logit-scale", "50",
            "--warmup", "2", "--log-every-n-steps", "1",
            "--logs", str(tmp_path), "--name", "t",
        ]
    )
    assert np.isfinite(metrics["loss"])
    out = tmp_path / "t"
    assert (out / "results.json").exists()
    assert json.loads((out / "results.json").read_text())["loss"] == metrics["loss"]
    assert any((out / "checkpoints").glob("step_*"))


def test_embed_cli(tmp_path):
    """Embedding export over a generated shard dataset."""
    import sys
    sys.path.insert(0, str(Path(__file__).parents[1] / "scripts"))
    from tests.test_preprocess import _make_raw_hest
    from spatial_clip_tpu.data.preprocessing.entry import run as preprocess_run
    from spatial_clip_tpu.cli import embed

    raw, genes = _make_raw_hest(tmp_path, n_spots=5, n_genes=6)
    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(genes))
    hgnc = tmp_path / "hgnc.txt"
    hgnc.write_text("symbol\tstatus\n" + "\n".join(f"{g}\tApproved" for g in genes))
    preprocess_run({
        "dataset": {"key": "e", "description": ""},
        "source": {"raw_data_dir": str(raw), "hgnc_path": str(hgnc),
                   "global_hvg_path": str(hvg)},
        "intermediate_dir": str(tmp_path / "inter"),
        "output_dir": str(tmp_path / "out"),
        "run": {"stage": "full"},
        "params": {
            "general": {"batch_key": "sample_id", "species_filter": None},
            "samples_to_exclude": [],
            "gene_alignment": {"keep_status": ["Approved"], "keep_locus_types": None},
            "sentence_generation": {"n_top_genes": 4},
            "sharding": {"max_samples_per_shard": 10},
            "tiling": {"tile_size": 32},
        },
        "performance": {"max_workers": 1, "limit_samples": -1},
    })
    out = tmp_path / "emb.npz"
    stats = embed.main([
        "--model", "ViT-Test", "--precision", "fp32",
        "--data", str(tmp_path / "out"), "--dataset-type", "shards",
        "--batch-size", "4", "--workers", "0",
        "--gene-vocab", str(hvg), "--out", str(out),
    ])
    assert stats["n"] == 10
    data = np.load(out)
    assert data["image_embeddings"].shape == (10, 32)
    np.testing.assert_allclose(
        np.linalg.norm(data["text_embeddings"], axis=1), 1.0, rtol=1e-4
    )
    assert len(set(data["tile_ids"].tolist())) == 10


def test_remote_sync_cli(tmp_path):
    """Background run-dir mirror (ref: file_utils.py:11-64, main.py:174-194)."""
    remote = tmp_path / "remote"
    metrics = main_train.main(
        [
            "--model", "ViT-Test", "--precision", "fp32",
            "--dataset-type", "synthetic",
            "--synthetic-num-samples", "32", "--synthetic-image-size", "32",
            "--batch-size", "8", "--epochs", "1", "--steps-per-epoch", "1",
            "--warmup", "1", "--log-every-n-steps", "1",
            "--logs", str(tmp_path / "logs"), "--name", "rs",
            "--remote-sync", str(remote), "--remote-sync-protocol", "local",
            "--remote-sync-frequency", "1000",
        ]
    )
    import numpy as np
    assert np.isfinite(metrics["loss"])
    synced = remote / "rs"
    assert (synced / "results.json").exists()
    # in-flight 'latest' artifacts are excluded from sync
    assert not any("latest" in p.name for p in synced.rglob("*"))


def test_remote_sync_unit(tmp_path):
    from spatial_clip_tpu.utils.file_sync import remote_sync

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    (src / "step_latest.tmp").write_text("skipme")
    dst = tmp_path / "dst"
    assert remote_sync(str(src), str(dst), "local")
    assert (dst / "a.txt").read_text() == "hello"
    assert not (dst / "step_latest.tmp").exists()
    assert not remote_sync(str(src), str(dst), "bogus")


def test_distillation_and_partial_locking(tmp_path):
    """--distill-model trains a student against a frozen teacher through
    DistillClipLoss (ref: main.py distill branch, loss.py:203-239); partial
    tower locking leaves the last N blocks trainable (ref: params.py
    --lock-image-unlocked-groups)."""
    metrics = main_train.main(
        [
            "--model", "ViT-Test", "--precision", "fp32",
            "--dataset-type", "synthetic",
            "--synthetic-num-samples", "32", "--synthetic-image-size", "32",
            "--batch-size", "8", "--epochs", "1", "--steps-per-epoch", "2",
            "--warmup", "1", "--log-every-n-steps", "1",
            "--logs", str(tmp_path), "--name", "d",
            "--distill-model", "ViT-Test",
            "--lock-image-tower", "--lock-image-unlocked-groups", "1",
            "--delete-previous-checkpoint",
        ]
    )
    import numpy as np
    assert np.isfinite(metrics["loss"])


def test_lock_prefix_generation():
    from spatial_clip_tpu import create_model

    bundle = create_model("ViT-Test", precision="fp32", seed=0)
    ns = main_train.parse_args(
        ["--lock-image-tower", "--lock-image-unlocked-groups", "1",
         "--lock-text-tower"]
    )
    prefixes = main_train._lock_prefixes(bundle, ns)
    assert "text" in prefixes
    assert "visual/transformer/resblocks_0" in prefixes
    # the last vision block stays trainable
    n_layers = bundle.cfg.vision_cfg.layers
    assert f"visual/transformer/resblocks_{n_layers - 1}" not in prefixes


def test_flag_tail_parity_wiring():
    """The round-2 flag tail: --opt/--momentum/--skip-scheduler/
    --logit-scale-cap alias/--spatial-data-dir implication/LN-freeze locking
    (ref: params.py + main.py usages)."""
    ns = main_train.parse_args(
        ["--opt", "sgd", "--momentum", "0.8", "--skip-scheduler",
         "--logit-scale-cap", "50", "--spatial-data-dir", "/tmp/sp"]
    )
    assert ns.opt == "sgd" and ns.momentum == 0.8 and ns.skip_scheduler
    assert ns.cap_logit_scale == 50.0  # --logit-scale-cap aliases
    assert ns.use_spatial_dataset and ns.train_data == "/tmp/sp"

    # partial text locking leaves LN params trainable unless
    # --lock-text-freeze-layer-norm (ref: model.py lock_text_tower)
    from spatial_clip_tpu import create_model

    bundle = create_model("ViT-Test", precision="fp32", seed=0)
    soft = main_train._lock_prefixes(
        bundle,
        main_train.parse_args(
            ["--lock-text-tower", "--lock-text-unlocked-layers", "1"]
        ),
    )
    hard = main_train._lock_prefixes(
        bundle,
        main_train.parse_args(
            ["--lock-text-tower", "--lock-text-unlocked-layers", "1",
             "--lock-text-freeze-layer-norm"]
        ),
    )
    assert "text/transformer/resblocks_0/attn" in soft
    assert "text/transformer/resblocks_0" not in soft
    assert "text/transformer/resblocks_0" in hard


def test_optimizer_families():
    """sgd/lion optimizers build and step (ref: params.py --opt)."""
    import jax.numpy as jnp

    from spatial_clip_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones((4,)) * 0.1}
    for opt in ("adamw", "sgd", "lion"):
        tx, sched = make_optimizer(
            params, learning_rate=1e-2, opt=opt, momentum=0.9,
            schedule_name="const", warmup_steps=0, total_steps=10,
        )
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert updates["w"].shape == (4, 4)
        assert float(jnp.abs(updates["w"]).sum()) > 0
