"""Hyperparameter sweep driver (the reference runs Optuna through Hydra
multirun, ref: configs/hparams_search/loss_sweep.yaml + README sweeps).

Grid or random search over override values; each trial is a full
``train.train(cfg)`` run, ranked by ``optimized_metric``.

    python -m spatial_clip_tpu.cli.sweep --trials 4 --mode random \
        --param optimizer.learning_rate=loguniform:1e-5,1e-3 \
        --param loss.temp_reg_weight=choice:0.0,0.1,1.0 \
        -- experiment=smoke_synthetic
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Any, Dict, List

import numpy as np


def _parse_space(spec: str):
    key, _, rng = spec.partition("=")
    kind, _, args = rng.partition(":")
    vals = args.split(",")
    if kind == "choice":
        return key, ("choice", [json.loads(v) if v[0].isdigit() or v[0] in "-." else v for v in vals])
    if kind == "uniform":
        return key, ("uniform", (float(vals[0]), float(vals[1])))
    if kind == "loguniform":
        return key, ("loguniform", (float(vals[0]), float(vals[1])))
    raise ValueError(f"bad param spec: {spec} (use choice:/uniform:/loguniform:)")


def _sample(space, rng: np.random.Generator) -> Dict[str, Any]:
    out = {}
    for key, (kind, arg) in space.items():
        if kind == "choice":
            out[key] = arg[int(rng.integers(len(arg)))]
        elif kind == "uniform":
            out[key] = float(rng.uniform(*arg))
        else:
            lo, hi = np.log(arg[0]), np.log(arg[1])
            out[key] = float(np.exp(rng.uniform(lo, hi)))
    return out


def _grid(space) -> List[Dict[str, Any]]:
    import itertools

    keys = list(space)
    choices = []
    for k in keys:
        kind, arg = space[k]
        if kind != "choice":
            raise ValueError("grid mode requires choice: spaces")
        choices.append(arg)
    return [dict(zip(keys, combo)) for combo in itertools.product(*choices)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--mode", choices=["random", "grid"], default="random")
    ap.add_argument("--param", action="append", default=[], dest="params")
    ap.add_argument("--direction", choices=["minimize", "maximize"], default="minimize")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sweep_results.json")
    ap.add_argument("overrides", nargs="*", default=[])
    args = ap.parse_args(argv)

    sys.path.insert(0, str(Path(__file__).parents[2]))
    import train as train_entry
    from spatial_clip_tpu.config import compose

    space = dict(_parse_space(s) for s in args.params)
    rng = np.random.default_rng(args.seed)
    trials = (
        _grid(space)[: args.trials or None]
        if args.mode == "grid"
        else [_sample(space, rng) for _ in range(args.trials)]
    )

    results = []
    for i, trial in enumerate(trials):
        trial_overrides = list(args.overrides) + [
            f"{k}={v}" for k, v in trial.items()
        ] + [f"name=sweep_trial_{i}"]
        cfg = compose(train_entry.CONFIG_DIR, "train", trial_overrides)
        try:
            value, _ = train_entry.train(cfg)
            results.append({"trial": i, "params": trial, "value": value})
            print(json.dumps(results[-1]))
        except Exception as e:
            results.append({"trial": i, "params": trial, "error": str(e)})
            print(f"trial {i} failed: {e}", file=sys.stderr)
    scored = [r for r in results if r.get("value") is not None]
    best = (
        (min if args.direction == "minimize" else max)(scored, key=lambda r: r["value"])
        if scored
        else None
    )
    summary = {"best": best, "results": results}
    Path(args.out).write_text(json.dumps(summary, indent=2, default=float))
    print("best:", json.dumps(best, default=float))
    return summary


if __name__ == "__main__":
    main()
