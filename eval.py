"""Evaluation entry point (ref: src/eval.py:38-99).

    python eval.py ckpt_path=logs/train/runs/x/checkpoints experiment=...

Restores a checkpoint and runs the full retrieval + zero-shot evaluation
suite on the val/test split (ref: trainer.test path, spatial_clip_module.py:
124-136; CLI eval open_clip_train/train.py:278-380).
"""
from __future__ import annotations

import json
import logging
import sys
from pathlib import Path
from typing import Any, Dict

log = logging.getLogger(__name__)

CONFIG_DIR = Path(__file__).parent / "configs"


def evaluate(cfg: Dict[str, Any]) -> Dict[str, float]:
    import jax

    # device preset must be applied before any backend use, same as
    # train.py: the JAX_PLATFORMS env var alone is ignored once
    # sitecustomize pre-registers the TPU backend
    tcfg_early = cfg.get("trainer", {})
    if tcfg_early.get("platform"):
        jax.config.update("jax_platforms", str(tcfg_early["platform"]))
        if tcfg_early.get("sim_devices"):
            jax.config.update(
                "jax_num_cpu_devices", int(tcfg_early["sim_devices"])
            )

    import numpy as np

    from spatial_clip_tpu.train.logging_utils import make_loggers, setup_logging
    from train import build_datamodule, build_model, build_trainer

    out_dir = Path(cfg["paths"]["output_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    setup_logging(str(out_dir / "eval.log"))

    dm = build_datamodule(cfg)
    bundle, pp_train, pp_val, tokenizer, hvg = build_model(cfg)
    dm.preprocess_fn = pp_val  # deterministic transforms for eval
    dm.preprocess_fn_val = pp_val
    dm.tokenizer = tokenizer
    dm.prepare_data()
    dm.setup("fit")

    trainer = build_trainer(cfg, bundle, total_steps=1)
    state = trainer.init_state()

    ckpt_path = cfg.get("ckpt_path")
    if ckpt_path:
        p = Path(ckpt_path)
        if p.is_dir() and any(p.glob("step_*")):
            from spatial_clip_tpu.train.checkpoints import CheckpointManager

            mgr = CheckpointManager(str(p))
            host = jax.tree.map(np.asarray, state)
            state, step = mgr.restore(host)
            state = jax.device_put(state, trainer._repl)
            log.info("Restored checkpoint step %d from %s", step, p)
        else:
            from spatial_clip_tpu.models.factory import load_checkpoint

            params = load_checkpoint(bundle.params, ckpt_path, bundle.model_name)
            state = state.replace(params=jax.device_put(params, trainer._repl))
            log.info("Loaded weights from %s", ckpt_path)

    metrics = trainer.evaluate(state, dm.test_dataloader())

    # zero-shot gene-expression PCC when an HVG bank is configured
    if hvg and Path(hvg).exists():
        from spatial_clip_tpu.train.evaluate import zero_shot_gene_expression

        pcc = zero_shot_gene_expression(
            bundle, state.params, tokenizer, hvg, dm.test_dataloader()
        )
        metrics["zero_shot_pcc"] = pcc

    metrics = {f"test/{k}": float(v) for k, v in metrics.items()}
    loggers = make_loggers(cfg.get("logger", {}).get("report_to", "csv,jsonl"), str(out_dir))
    loggers.log(0, metrics)
    log.info("Eval metrics: %s", metrics)
    (out_dir / "eval_metrics.json").write_text(json.dumps(metrics, indent=2))
    return metrics


def main(argv=None):
    from spatial_clip_tpu.config import compose

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(CONFIG_DIR, "eval", overrides)
    return evaluate(cfg)


if __name__ == "__main__":
    main()
