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
