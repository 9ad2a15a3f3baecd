"""Observability tail: debug presets, TPE sweep, logger backends, tile differ.

Ref: configs/debug/{fdr,limit,overfit,profiler,default}.yaml,
configs/logger/*, README Optuna sweeps, scripts/inspect_tile_differences.py.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import train as train_entry
from spatial_clip_tpu.config import compose

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def _cfg(tmp_path, extra=()):
    return compose(
        CONFIG_DIR,
        "train",
        [
            "experiment=smoke_synthetic",
            f"paths.root_dir={tmp_path}",
            "data.dataset_format_kwargs.num_samples=32",
            *extra,
        ],
    )


def test_debug_preset_overfit(tmp_path):
    cfg = _cfg(tmp_path, ("debug=overfit", "trainer.epochs=2", "data.batch_size=8"))
    assert cfg["trainer"]["overfit_batches"] == 3
    value, objects = train_entry.train(cfg)
    # 2 epochs x 3 overfit batches
    assert int(objects["state"].step) == 6


def test_debug_preset_profiler(tmp_path):
    cfg = _cfg(tmp_path, ("debug=profiler",))
    value, objects = train_entry.train(cfg)
    prof = Path(cfg["paths"]["output_dir"]) / "profile"
    assert prof.exists() and any(prof.rglob("*"))


def test_debug_preset_fdr_detect_anomaly(tmp_path):
    import jax

    cfg = _cfg(tmp_path, ("debug=fdr",))
    assert cfg["trainer"]["detect_anomaly"] is True
    try:
        value, objects = train_entry.train(cfg)
        assert int(objects["state"].step) == 1
        assert jax.config.jax_debug_nans  # the sanitizer was switched on
    finally:
        jax.config.update("jax_debug_nans", False)


def test_tpe_sweep_converges():
    from spatial_clip_tpu.cli.sweep import _parse_space, _tpe_sample

    space = dict(
        _parse_space(s)
        for s in ["lr=loguniform:1e-5,1e-1", "mode=choice:a,b,c"]
    )
    rng = np.random.default_rng(0)
    history = []

    def objective(p):
        return (np.log10(p["lr"]) + 3) ** 2 + (0.0 if p["mode"] == "b" else 1.0)

    for _ in range(40):
        p = _tpe_sample(space, history, rng, "minimize")
        history.append({"params": p, "value": objective(p)})
    last = history[-10:]
    lrs = [np.log10(h["params"]["lr"]) for h in last]
    assert abs(float(np.mean(lrs)) + 3) < 1.0
    assert [h["params"]["mode"] for h in last].count("b") >= 5


def test_logger_presets_compose_and_gate(tmp_path):
    from spatial_clip_tpu.train.logging_utils import make_loggers

    for preset in ("aim", "aim_csv", "mlflow", "neptune", "comet",
                   "many_loggers", "wandb"):
        cfg = compose(CONFIG_DIR, "train", [f"logger={preset}"])
        spec = cfg["logger"]["report_to"]
        ml = make_loggers(spec, str(tmp_path / preset))
        ml.log(0, {"train/loss": 1.0})  # must not raise even when gated out


def test_inspect_tile_differences(tmp_path, capsys):
    import sys

    sys.path.insert(0, str(Path(__file__).parents[1] / "scripts"))
    import inspect_tile_differences as itd

    from tests.test_spatial_datasets import _make_parquet_split, _make_shard_dataset

    pq = _make_parquet_split(tmp_path / "pq")
    sh = _make_shard_dataset(tmp_path / "sh")
    sample = next(p.name for p in Path(sh).iterdir() if p.is_dir())
    reports = itd.main([
        sample, "--parquet-root", str(pq), "--shard-root", str(sh),
        "--out", str(tmp_path / "report.json"),
    ])
    assert (tmp_path / "report.json").exists()
    assert reports[0]["shard_tiles"] > 0
