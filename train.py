"""Training entry point (ref: src/train.py:44-172).

Usage mirrors the reference's Hydra CLI:

    python train.py experiment=smoke_synthetic trainer.epochs=1 seed=1

Composition/overrides are handled by spatial_clip_tpu.config (a lightweight
Hydra-equivalent). The function performs the same orchestration as the
reference ``train()``: seed -> datamodule -> model -> model<->data handshake
(ref: src/train.py:69-74) -> fit -> optional test, returning the optimized
metric for sweeps (ref: src/utils/utils.py:98-119).
"""
from __future__ import annotations

import logging
import math
import sys
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

log = logging.getLogger(__name__)

CONFIG_DIR = Path(__file__).parent / "configs"


def build_datamodule(cfg: Dict[str, Any]):
    from spatial_clip_tpu.config import instantiate

    return instantiate(cfg["data"])


def build_model(cfg: Dict[str, Any]):
    from spatial_clip_tpu.models.factory import create_model_and_transforms, get_tokenizer

    mcfg = dict(cfg["model"])
    tok_cfg = mcfg.pop("tokenizer", None) or {}
    hvg = mcfg.pop("global_hvg_path", None)
    model_name = mcfg.pop("model_name")
    gene_vocab = tok_cfg.get("gene_vocab") or (hvg if hvg and Path(hvg).exists() else None)
    overrides = {}
    gene_cfg_user = mcfg.pop("gene_cfg", None)
    if gene_cfg_user:
        # gene-MLP tower requested at the config level: the 'tokenizer' is
        # the rank-weighted vectorizer and defines the tower's input width
        from spatial_clip_tpu.models.tokenizer import GeneVectorizer

        if gene_vocab is None:
            raise ValueError("model.gene_cfg requires a gene vocab (global_hvg_path)")
        tokenizer = GeneVectorizer(gene_vocab)
        overrides["gene_cfg"] = {
            **dict(gene_cfg_user),
            "num_genes": int(tokenizer.num_genes),
        }
    else:
        tokenizer = get_tokenizer(
            model_name,
            gene_vocab=gene_vocab,
            bpe_path=tok_cfg.get("bpe_path"),
        )
    if hasattr(tokenizer, "num_genes") and "gene_cfg" not in overrides:
        # gene-MLP tower from the model JSON: vectorizer defines input width
        overrides["gene_cfg"] = {"num_genes": int(tokenizer.num_genes)}
    elif gene_vocab is not None and hasattr(tokenizer, "vocab_size"):
        # the gene tokenizer defines the closed vocab — the text tower's
        # embedding table must match it, not the JSON default
        base_text = dict(mcfg.pop("text_cfg", None) or {})
        base_text["vocab_size"] = int(tokenizer.vocab_size)
        overrides["text_cfg"] = base_text
    bundle, pp_train, pp_val = create_model_and_transforms(
        model_name,
        pretrained=mcfg.pop("pretrained", None),
        precision=mcfg.pop("precision", "bf16"),
        aug_cfg=mcfg.pop("aug_cfg", None),
        remat=mcfg.pop("remat", False),
        force_quick_gelu=mcfg.pop("force_quick_gelu", False),
        seed=int(cfg.get("seed", 0)),
        **overrides,
    )
    return bundle, pp_train, pp_val, tokenizer, hvg


def build_trainer(cfg, bundle, total_steps: int, mesh=None):
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    tcfg = cfg.get("trainer", {})
    ocfg = cfg.get("optimizer", {})
    scfg = cfg.get("scheduler", {})
    lcfg = dict(cfg.get("loss", {}))
    loss = make_loss(lcfg.pop("name", "spatial"), **lcfg)
    aug = (cfg.get("model") or {}).get("aug_cfg") or {}
    config = TrainerConfig(
        learning_rate=float(ocfg.get("learning_rate", 5e-4)),
        weight_decay=float(ocfg.get("weight_decay", 0.2)),
        betas=tuple(ocfg.get("betas", (0.9, 0.98))),
        eps=float(ocfg.get("eps", 1e-6)),
        grad_clip_norm=tcfg.get("grad_clip_norm", 1.0),
        schedule=scfg.get("name", "cosine"),
        warmup_steps=int(scfg.get("warmup_steps", 500)),
        total_steps=max(int(total_steps), 1),
        grad_accum=int(tcfg.get("grad_accum", 1)),
        grad_accum_mode=tcfg.get("grad_accum_mode", "cached"),
        scan_steps=int(tcfg.get("scan_steps", 1)),
        augment=bool(tcfg.get("augment", True)) and aug is not None,
        color_jitter=(aug or {}).get("color_jitter"),
        seed=int(cfg.get("seed", 42)),
        log_every=int(tcfg.get("log_every", 10)),
        ckpt_dir=(
            str(Path(cfg["paths"]["output_dir"]) / "checkpoints")
            if cfg.get("save_ckpt")
            else None
        ),
        save_every_steps=tcfg.get("save_every_steps"),
        keep_ckpts=int(tcfg.get("keep_ckpts", 3)),
        monitor=((cfg.get("callbacks") or {}).get("model_checkpoint") or {}).get(
            "monitor", "R@1"
        ),
        monitor_mode=((cfg.get("callbacks") or {}).get("model_checkpoint") or {}).get(
            "mode", "max"
        ),
        early_stop_patience=(
            ((cfg.get("callbacks") or {}).get("early_stopping") or {}).get("patience")
        ),
    )
    return Trainer(bundle, loss=loss, config=config, mesh=mesh)


def train(cfg: Dict[str, Any]) -> Tuple[Optional[float], Dict[str, Any]]:
    import numpy as np

    from spatial_clip_tpu.parallel.mesh import maybe_init_distributed
    from spatial_clip_tpu.train.logging_utils import make_loggers, setup_logging

    # device presets (ref: configs/trainer/{cpu,gpu,ddp,ddp_sim}.yaml):
    # platform/sim_devices must be applied before any backend use — the env
    # var alone is ignored once sitecustomize pre-registers the TPU backend
    tcfg_early = cfg.get("trainer", {})
    if tcfg_early.get("platform"):
        import jax

        jax.config.update("jax_platforms", str(tcfg_early["platform"]))
        if tcfg_early.get("sim_devices"):
            jax.config.update(
                "jax_num_cpu_devices", int(tcfg_early["sim_devices"])
            )

    maybe_init_distributed()
    out_dir = Path(cfg["paths"]["output_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    setup_logging(str(out_dir / "train.log"))
    np.random.seed(int(cfg.get("seed", 42)))

    log.info("Instantiating datamodule and model")
    dm = build_datamodule(cfg)
    bundle, pp_train, pp_val, tokenizer, hvg = build_model(cfg)

    # model <-> datamodule handshake (ref: src/train.py:69-74)
    dm.preprocess_fn = pp_train
    dm.preprocess_fn_val = pp_val
    dm.tokenizer = tokenizer
    dm.prepare_data()
    dm.setup("fit")

    tcfg = cfg.get("trainer", {})
    if tcfg.get("detect_anomaly"):
        # NaN/Inf sanitizer — the jax_debug_nans analogue of Lightning's
        # detect_anomaly (ref: configs/debug/default.yaml:33)
        import jax

        jax.config.update("jax_debug_nans", True)
    steps_per_epoch = len(dm.train_dataloader())
    limit = tcfg.get("limit_batches")
    if limit:
        steps_per_epoch = min(steps_per_epoch, int(limit))
    overfit = int(tcfg.get("overfit_batches") or 0)
    if overfit:
        # ref: configs/debug/overfit.yaml — train repeatedly on N batches
        steps_per_epoch = overfit
    epochs = int(tcfg.get("epochs", 1))
    max_steps = int(tcfg.get("max_steps", -1))
    total_steps = (
        max_steps if max_steps > 0 else epochs * max(steps_per_epoch, 1)
    )

    trainer = build_trainer(cfg, bundle, total_steps)
    loggers = make_loggers(cfg.get("logger", {}).get("report_to", "csv"), str(out_dir))

    def train_iter():
        loader = dm.train_dataloader()
        loader.set_epoch(getattr(train_iter, "epoch", 0))
        train_iter.epoch = getattr(train_iter, "epoch", 0) + 1
        return loader

    if overfit:
        import itertools

        cached = list(itertools.islice(iter(dm.train_dataloader()), overfit))

        def train_iter():  # noqa: F811 — overfit preset replaces the loader
            return iter(cached)

    val_iter = (lambda: dm.val_dataloader()) if dm.data_val is not None else None

    profiler_dir = None
    if tcfg.get("profiler"):
        # execution-time profiling preset (ref: configs/debug/profiler.yaml);
        # the trace is readable with tensorboard / xprof
        import jax

        profiler_dir = str(out_dir / "profile")
        jax.profiler.start_trace(profiler_dir)
    try:
        state, metrics = trainer.fit(
            train_iter,
            val_iter,
            epochs=epochs,
            steps_per_epoch=(
                min(steps_per_epoch, max_steps) if max_steps > 0 else steps_per_epoch
            ),
            logger=loggers,
            resume=cfg.get("resume"),
        )
    finally:
        if profiler_dir:
            import jax

            jax.profiler.stop_trace()
            log.info("profiler trace written to %s", profiler_dir)

    if cfg.get("test", False) and val_iter is not None:
        test_metrics = trainer.evaluate(state, dm.test_dataloader())
        metrics.update({f"test/{k}": v for k, v in test_metrics.items()})
        loggers.log(int(state.step), {f"test/{k}": v for k, v in test_metrics.items()})

    # optimized metric for sweeps (ref: src/utils/utils.py:98-119)
    metric_name = cfg.get("optimized_metric")
    value = metrics.get(metric_name) if metric_name else None
    objects = {
        "state": state,
        "trainer": trainer,
        "datamodule": dm,
        "bundle": bundle,
        "metrics": metrics,
        "output_dir": out_dir,
    }
    log.info("Final metrics: %s", {k: v for k, v in metrics.items() if isinstance(v, float)})
    return value, objects


def main(argv=None):
    from spatial_clip_tpu.config import compose

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(CONFIG_DIR, "train", overrides)
    value, _ = train(cfg)
    if value is not None and not math.isfinite(float(value)):
        raise RuntimeError(f"optimized metric is not finite: {value}")
    return value


if __name__ == "__main__":
    main()
