"""Entry-point smoke tests (ref pattern: tests/test_train.py:12-21 shrunken
train(cfg) run + eval round-trip from the merged dump)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import train as train_entry  # noqa: E402
import eval as eval_entry  # noqa: E402
from spatial_clip_tpu.config import compose  # noqa: E402

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def _smoke_cfg(tmp_path, extra=()):
    return compose(
        CONFIG_DIR,
        "train",
        [
            "experiment=smoke_synthetic",
            f"paths.root_dir={tmp_path}",
            "trainer.limit_batches=2",
            "data.dataset_format_kwargs.num_samples=64",
            "trainer.log_every=1",
            *extra,
        ],
    )


def test_train_smoke(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    value, objects = train_entry.train(cfg)
    assert value is not None and np.isfinite(value)
    assert int(objects["state"].step) == 2
    out = Path(cfg["paths"]["output_dir"])
    assert (out / "metrics.csv").exists()


def test_train_ckpt_then_eval(tmp_path):
    cfg = _smoke_cfg(tmp_path, ("save_ckpt=true", "test=false"))
    value, objects = train_entry.train(cfg)
    ckpt_dir = Path(cfg["paths"]["output_dir"]) / "checkpoints"
    assert any(ckpt_dir.glob("step_*"))

    eval_cfg = compose(
        CONFIG_DIR,
        "eval",
        [
            "experiment=smoke_synthetic",
            f"paths.root_dir={tmp_path}",
            f"ckpt_path={ckpt_dir}",
            "data.dataset_format_kwargs.num_samples=64",
        ],
    )
    metrics = eval_entry.evaluate(eval_cfg)
    assert np.isfinite(metrics["test/loss"])
    assert "test/image_to_text_R@1" in metrics


def test_train_clip_loss_variant(tmp_path):
    cfg = _smoke_cfg(tmp_path, ("loss=clip",))
    value, _ = train_entry.train(cfg)
    assert np.isfinite(value)


def test_gene_tokenizer_drives_text_vocab(tmp_path):
    """global_hvg_path -> GeneTokenizer; the text tower's vocab must match."""
    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(f"GENE{i}" for i in range(300)))
    cfg = _smoke_cfg(tmp_path, (f"model.global_hvg_path={hvg}",))
    value, objects = train_entry.train(cfg)
    bundle = objects["bundle"]
    tok = objects["datamodule"].tokenizer
    assert bundle.cfg.text_cfg.vocab_size == tok.vocab_size
    assert (
        bundle.params["text"]["token_embedding"]["embedding"].shape[0]
        == tok.vocab_size
    )
    assert np.isfinite(value)


def test_eval_zero_shot_pcc(tmp_path):
    """eval.py computes zero-shot gene-expression PCC when an HVG bank exists."""
    from spatial_clip_tpu.data.datasets.synthetic import synthetic_gene_list

    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(synthetic_gene_list()[:100]))
    eval_cfg = compose(
        CONFIG_DIR,
        "eval",
        [
            "experiment=smoke_synthetic",
            f"paths.root_dir={tmp_path}",
            f"model.global_hvg_path={hvg}",
            "data.dataset_format_kwargs.num_samples=64",
        ],
    )
    metrics = eval_entry.evaluate(eval_cfg)
    assert "test/zero_shot_pcc" in metrics
    assert -1.0 <= metrics["test/zero_shot_pcc"] <= 1.0


def test_gene_mlp_tower_end_to_end(tmp_path):
    """North-star config 1: gene-MLP tower trains via the vectorizer path."""
    from spatial_clip_tpu.data.datasets.synthetic import synthetic_gene_list

    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(synthetic_gene_list()[:128]))
    cfg = _smoke_cfg(
        tmp_path,
        (
            "model.model_name=ViT-Test",
            f"model.global_hvg_path={hvg}",
            "+model.gene_cfg.width=32",
            "+model.gene_cfg.layers=1",
        ),
    )
    # gene tower selected via model cfg override
    cfg["model"]["gene_cfg"] = {"num_genes": 128, "width": 32, "layers": 1}
    value, objects = train_entry.train(cfg)
    assert np.isfinite(value)
    bundle = objects["bundle"]
    assert bundle.cfg.gene_cfg is not None
    tok = objects["datamodule"].tokenizer
    assert hasattr(tok, "num_genes") and tok.num_genes == 128


@pytest.mark.slow
def test_sweep_driver_grid(tmp_path):
    """Grid sweep over 2 trials ranks by the optimized metric
    (ref pattern: tests/test_sweeps.py shell-driven sweeps)."""
    from spatial_clip_tpu.cli import sweep

    out = tmp_path / "sweep.json"
    summary = sweep.main([
        "--mode", "grid", "--trials", "2",
        "--param", "optimizer.learning_rate=choice:0.001,0.0001",
        "--out", str(out),
        "--",
        "experiment=smoke_synthetic",
        f"paths.root_dir={tmp_path}",
        "trainer.limit_batches=2",
        "data.dataset_format_kwargs.num_samples=64",
        "test=false",
    ])
    assert len(summary["results"]) == 2
    assert summary["best"] is not None
    values = [r["value"] for r in summary["results"] if "value" in r]
    assert summary["best"]["value"] == min(values)
    assert out.exists()
