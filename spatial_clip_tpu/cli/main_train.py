"""Standalone argparse trainer CLI — the ``python -m open_clip_train.main``
analogue (ref: src/open_clip_train/main.py:76-581 + params.py flag surface).

    python -m spatial_clip_tpu.cli.main_train \
        --model ViT-B-32 --dataset-type synthetic --batch-size 64 --epochs 1

One JAX stack serves both reference trainers; this CLI maps the reference's
most-used flags (incl. the spatial group, params.py:486-499, and the
temperature group, :502-517) onto the same Trainer/datamodule used by
train.py.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

log = logging.getLogger(__name__)


def get_default_params(model_name: str) -> dict:
    """Model-conditioned defaults (ref: params.py:5-18)."""
    model_name = model_name.lower()
    if "vit" in model_name:
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}


def parse_args(args=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="spatial-clip-tpu standalone trainer")
    # data
    p.add_argument("--train-data", default=None, help="dataset dir / csv / shards root")
    p.add_argument("--val-data", default=None)
    p.add_argument("--dataset-type",
                   choices=["auto", "parquet", "shards", "synthetic", "csv"],
                   default="auto")
    p.add_argument("--spatial-data-dir", default=None,
                   help="spatial dataset root; implies --use-spatial-dataset "
                        "(ref: main.py:406-409)")
    p.add_argument("--imagenet-v2", default=None,
                   help="second zero-shot eval folder (ImageNetV2 layout; "
                        "ref: data.py:125,561)")
    p.add_argument("--imagenet-val", default=None,
                   help="ImageFolder root for zero-shot eval (ref: params.py"
                        " --imagenet-val, zero_shot.py:45-86)")
    p.add_argument("--zeroshot-frequency", type=int, default=2,
                   help="run zero-shot every N epochs (ref: params.py)")
    p.add_argument("--zeroshot-templates", default="openai",
                   choices=["openai", "simple"])
    p.add_argument("--train-split", default="train")
    p.add_argument("--val-split", default="val")
    p.add_argument("--csv-img-key", default="filepath")
    p.add_argument("--csv-caption-key", default="title")
    p.add_argument("--csv-separator", default="\t")
    p.add_argument("--workers", type=int, default=4)
    # TPU-native extra: thread (zero-copy) vs process (torch-workers
    # analogue) loader parallelism
    p.add_argument("--worker-type", choices=["thread", "process"],
                   default="thread")
    p.add_argument("--use-spatial-dataset", action="store_true")
    p.add_argument("--k-neighbors", type=int, default=6)
    p.add_argument("--train-num-samples", type=int, default=None,
                   help="cap/declare the train set size (ref: params.py)")
    p.add_argument("--val-num-samples", type=int, default=None)
    p.add_argument("--dataset-resampled", action="store_true",
                   help="sample shards with replacement (ref: data.py "
                        "ResampledShards2)")
    p.add_argument("--train-data-upsampling-factors", default=None,
                   help="':'-separated per-source weights (alternative to "
                        "'::'-weighted --train-data)")
    # model
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--pretrained", default="")
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32", "amp_bf16", "pure_bf16", "float32"])
    p.add_argument("--force-quick-gelu", action="store_true")
    p.add_argument("--grad-checkpointing", action="store_true")
    p.add_argument("--lock-image-tower", "--lock-image", action="store_true",
                   dest="lock_image_tower",
                   help="LiT-style frozen image tower (ref: main.py:276-287)")
    p.add_argument("--lock-text-tower", "--lock-text", action="store_true",
                   dest="lock_text_tower")
    p.add_argument("--lock-image-unlocked-groups", type=int, default=0,
                   help="leave the last N vision blocks trainable when "
                        "locking (ref: params.py --lock-image-unlocked-groups)")
    p.add_argument("--lock-text-unlocked-layers", type=int, default=0)
    p.add_argument("--lock-image-freeze-bn-stats", action="store_true",
                   help="parity flag: BN running stats here are frozen "
                        "parameters by design (FrozenBatchNorm), so stats "
                        "never update regardless (ref: main.py:280)")
    p.add_argument("--lock-text-freeze-layer-norm", action="store_true",
                   help="also freeze LayerNorm params inside locked text "
                        "blocks (ref: main.py:284, model.py lock_text_tower)")
    p.add_argument("--pretrained-image", action="store_true",
                   help="load default base weights for a timm-style image "
                        "trunk when no CLIP checkpoint is given (registry "
                        "gated offline; ref: factory.py:264,467)")
    p.add_argument("--force-patch-dropout", type=float, default=None,
                   help="override the config's patch_dropout (ref: params.py)")
    p.add_argument("--force-custom-text", action="store_true",
                   help="accepted for parity; one tower implementation here")
    p.add_argument("--cache-dir", default=None,
                   help="pretrained checkpoint cache dir")
    p.add_argument("--gene-vocab", default=None)
    p.add_argument("--bpe-path", default=None)
    # distillation (ref: params.py --distill-model/--distill-pretrained,
    # main.py distill branch; losses.DistillClipLoss exists)
    p.add_argument("--distill-model", default=None)
    p.add_argument("--distill-pretrained", default=None)
    # CoCa loss weights (ref: params.py --coca-*-loss-weight)
    p.add_argument("--coca-caption-loss-weight", type=float, default=2.0)
    p.add_argument("--coca-contrastive-loss-weight", type=float, default=1.0)
    # optimization
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=32)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--beta1", type=float, default=None)
    p.add_argument("--beta2", type=float, default=None)
    p.add_argument("--eps", type=float, default=None)
    p.add_argument("--wd", type=float, default=0.2)
    p.add_argument("--warmup", type=int, default=10000)
    p.add_argument("--lr-scheduler", default="cosine",
                   choices=["cosine", "const", "const-cooldown"])
    p.add_argument("--epochs-cooldown", type=int, default=None,
                   help="cooldown epochs for const-cooldown (ref: params.py)")
    p.add_argument("--lr-cooldown-end", type=float, default=0.0)
    p.add_argument("--lr-cooldown-power", type=float, default=1.0)
    p.add_argument("--grad-clip-norm", type=float, default=None)
    p.add_argument("--opt", default="adamw", choices=["adamw", "sgd", "lion"],
                   help="optimizer family (ref: params.py --opt)")
    p.add_argument("--momentum", type=float, default=None,
                   help="sgd momentum (ref: params.py --momentum)")
    p.add_argument("--skip-scheduler", action="store_true",
                   help="constant LR, no warmup/decay (ref: train.py:80)")
    p.add_argument("--accum-freq", type=int, default=1)
    p.add_argument("--accum-mode", choices=["cached", "simple"], default="cached")
    # TPU-native extra (no ref analogue): real optimizer steps per
    # dispatched XLA program (TrainerConfig.scan_steps); amortizes the
    # per-program launch overhead
    p.add_argument("--scan-steps", type=int, default=1)
    # loss
    p.add_argument("--use-spatial-loss", action="store_true")
    p.add_argument("--local-loss", action="store_true")
    p.add_argument("--gather-with-grad", action="store_true",
                   help="accepted for parity; JAX AD always differentiates gathers")
    p.add_argument("--siglip", action="store_true")
    p.add_argument("--loss-dist-impl", default="shift",
                   choices=["bidir", "shift", "reduce", "gather"])
    p.add_argument("--cap-logit-scale", "--logit-scale-cap",
                   dest="cap_logit_scale", type=float, default=None,
                   help="STE cap on exp(logit_scale) in the spatial loss "
                        "(ref: main.py:516 logit_scale_cap)")
    p.add_argument("--temp-reg-weight", type=float, default=0.0)
    p.add_argument("--neighbor-alpha-scale", type=float, default=1.0)
    p.add_argument("--float32-logits", action="store_true", default=True)
    p.add_argument("--use-fused-kernel", action="store_true",
                   help="pallas fused contrastive kernel (TPU)")
    # run management
    p.add_argument("--logs", default="./logs/")
    p.add_argument("--name", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--save-frequency", type=int, default=1)
    p.add_argument("--save-most-recent", action="store_true", default=True,
                   help="keep an always-current latest checkpoint "
                        "(ref: params.py --save-most-recent)")
    p.add_argument("--delete-previous-checkpoint", action="store_true",
                   help="keep only the newest step checkpoint (keep=1)")
    p.add_argument("--copy-codebase", action="store_true",
                   help="snapshot the package source into the run dir "
                        "(ref: main.py:584 copy_codebase)")
    p.add_argument("--debug", action="store_true", help="DEBUG-level logging")
    # torch/CUDA-runtime flags accepted for drop-in parity; no-ops on TPU
    # (jit replaces torchscript/compile; XLA owns device placement; collective
    # backends are ICI/DCN via JAX). A warning is logged when they are set.
    for noop in ("--torchscript", "--torchcompile", "--trace", "--horovod",
                 "--use-bn-sync", "--ddp-static-graph", "--no-set-device-rank",
                 "--use-bnb-linear", "--log-local"):
        p.add_argument(noop, action="store_true", help="no-op on TPU (parity)")
    p.add_argument("--device", default=None, help="no-op on TPU (parity)")
    p.add_argument("--dist-backend", default=None, help="no-op (JAX collectives)")
    p.add_argument("--dist-url", default=None, help="no-op (JAX runtime)")
    p.add_argument("--val-frequency", type=int, default=1)
    p.add_argument("--report-to", default="csv,jsonl")
    p.add_argument("--wandb-notes", default=None)
    p.add_argument("--wandb-project-name", default=None)
    p.add_argument("--remote-sync", default=None,
                   help="remote dir to mirror the run dir into (ref: "
                        "main.py:174-194 background S3/fsspec sync)")
    p.add_argument("--remote-sync-frequency", type=int, default=300)
    p.add_argument("--remote-sync-protocol", default="local",
                   choices=["local", "fsspec", "s3"])
    p.add_argument("--log-every-n-steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic-num-samples", type=int, default=1024)
    p.add_argument("--synthetic-image-size", type=int, default=224)
    ns = p.parse_args(args)
    # model-conditioned defaults (ref: params.py:521-528)
    defaults = get_default_params(ns.model)
    for k, v in defaults.items():
        if getattr(ns, k.replace("-", "_")) is None:
            setattr(ns, k.replace("-", "_"), v)
    if ns.spatial_data_dir:
        # --spatial-data-dir implies the spatial dataset + loss pathway
        # (ref: main.py:406-409)
        ns.train_data = ns.train_data or ns.spatial_data_dir
        ns.use_spatial_dataset = True
    return ns


def _detect_dataset_type(args) -> str:
    if args.dataset_type != "auto":
        return args.dataset_type
    if not args.train_data:
        return "synthetic"
    if " " in args.train_data.strip():
        return "shards"  # '::'-weighted multi-source
    p = Path(args.train_data)
    if p.suffix == ".csv" or p.suffix == ".tsv":
        return "csv"
    if (p / args.train_split / "nodes.parquet").exists() or (p / "nodes.parquet").exists():
        return "parquet"
    if any(p.rglob("*.tar")):
        return "shards"
    return "synthetic"


def _lock_prefixes(bundle, args) -> tuple:
    """Tower-locking prefixes incl. partial unlocking of the last N blocks
    (ref: params.py --lock-image-unlocked-groups/--lock-text-unlocked-layers,
    model.py lock methods)."""
    prefixes = []
    v = bundle.cfg.vision_cfg
    t = bundle.cfg.text_cfg
    if args.lock_image_tower:
        n = args.lock_image_unlocked_groups
        if n and isinstance(v.layers, int):
            prefixes += [
                "visual/conv1", "visual/class_embedding",
                "visual/positional_embedding", "visual/ln_pre",
            ]
            prefixes += [
                f"visual/transformer/resblocks_{i}"
                for i in range(max(v.layers - n, 0))
            ]
        else:
            prefixes.append("visual")
    if args.lock_text_tower:
        n = args.lock_text_unlocked_layers
        if n and t is not None:
            prefixes += ["text/token_embedding", "text/positional_embedding"]
            for i in range(max(t.layers - n, 0)):
                blk = f"text/transformer/resblocks_{i}"
                if getattr(args, "lock_text_freeze_layer_norm", False):
                    prefixes.append(blk)  # whole block incl. LN params
                else:
                    # torch default: LayerNorm weights stay trainable inside
                    # locked blocks (ref: model.py lock_text_tower
                    # freeze_layer_norm=False)
                    prefixes += [f"{blk}/attn", f"{blk}/mlp"]
        else:
            prefixes.append("text")
    return tuple(prefixes)


def main(args=None):
    from spatial_clip_tpu.data.datamodule import SpatialClipDataModule
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.models.factory import create_model_and_transforms, get_tokenizer
    from spatial_clip_tpu.parallel.mesh import maybe_init_distributed
    from spatial_clip_tpu.train.logging_utils import make_loggers, setup_logging
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    args = parse_args(args)
    maybe_init_distributed()
    # multi-host run-name sync: every process must agree on the timestamped
    # run dir (ref: main.py:95-97 broadcast_object(date_str))
    from spatial_clip_tpu.parallel.mesh import broadcast_object

    name = args.name or broadcast_object(time.strftime("%Y_%m_%d-%H_%M_%S"))
    out_dir = Path(args.logs) / name
    out_dir.mkdir(parents=True, exist_ok=True)
    setup_logging(str(out_dir / "out.log"))

    if args.debug:
        logging.getLogger().setLevel(logging.DEBUG)
    for noop in ("torchscript", "torchcompile", "trace", "horovod",
                 "use_bn_sync", "ddp_static_graph", "no_set_device_rank",
                 "use_bnb_linear"):
        if getattr(args, noop, False):
            log.warning("--%s is a torch-runtime flag; no-op on TPU",
                        noop.replace("_", "-"))
    if args.copy_codebase:
        # snapshot the package into the run dir (ref: main.py:584)
        import shutil

        import spatial_clip_tpu as pkg

        shutil.copytree(
            Path(pkg.__file__).parent, out_dir / "code" / "spatial_clip_tpu",
            ignore=shutil.ignore_patterns("__pycache__"), dirs_exist_ok=True,
        )

    overrides = {}
    if args.force_patch_dropout is not None:
        overrides["vision_cfg"] = {"patch_dropout": args.force_patch_dropout}
    bundle, pp_train, pp_val = create_model_and_transforms(
        args.model,
        pretrained=args.pretrained or None,
        precision=args.precision,
        force_quick_gelu=args.force_quick_gelu,
        remat=args.grad_checkpointing,
        seed=args.seed,
        **overrides,
    )

    if args.pretrained_image and not args.pretrained:
        # ref factory.py:467 loads default timm base weights at creation;
        # our pretrained registry is download-gated offline, so surface the
        # gating instead of silently training from scratch
        log.warning(
            "--pretrained-image: base image-tower weights come from the "
            "gated pretrained registry (models/pretrained.py); no cached "
            "weights found, image tower starts at init"
        )
    if args.lock_image_freeze_bn_stats and args.lock_image_tower:
        log.info(
            "--lock-image-freeze-bn-stats: BN running stats are frozen "
            "parameters by design here (FrozenBatchNorm); nothing to freeze"
        )

    teacher = None
    if args.distill_model:
        from spatial_clip_tpu.models.factory import create_model as _create

        teacher = _create(
            args.distill_model, pretrained=args.distill_pretrained or None,
            precision=args.precision, seed=args.seed,
        )
    tokenizer = get_tokenizer(
        args.model, gene_vocab=args.gene_vocab, bpe_path=args.bpe_path
    )

    dtype = _detect_dataset_type(args)
    fmt = {
        "parquet": "parquet_v1", "shards": "shards_v1",
        "synthetic": "synthetic", "csv": "csv",
    }[dtype]
    format_kwargs = {}
    if fmt == "synthetic":
        format_kwargs = {
            "num_samples": args.train_num_samples or args.synthetic_num_samples,
            "image_size": args.synthetic_image_size,
        }
    dm = SpatialClipDataModule(
        data_dir=args.train_data or "",
        k_neighbors=args.k_neighbors,
        batch_size=args.batch_size,
        num_workers=args.workers,
        worker_type=args.worker_type,
        dataset_format=fmt,
        dataset_format_kwargs=format_kwargs,
        splits={"train": args.train_split, "val": args.val_split},
        seed=args.seed,
    )
    dm.preprocess_fn = pp_train
    dm.preprocess_fn_val = pp_val
    dm.tokenizer = tokenizer
    if dtype == "shards" and args.train_data and (" " in args.train_data.strip()):
        # '::'-weighted multi-source syntax (ref: --train-data 'a::2 b::1')
        from spatial_clip_tpu.data.datasets import (
            ShardedSpatialDataset,
            _resolve_sample_ids,
        )
        from spatial_clip_tpu.data.resampling import ResampledDataset, parse_weighted_spec

        paths, weights = parse_weighted_spec(args.train_data)
        sources = []
        for root in paths:
            root = Path(root)
            sources.append(
                ShardedSpatialDataset(
                    dataset_root=root, split=args.train_split,
                    sample_ids=_resolve_sample_ids(args.train_split, root),
                    k_neighbors=args.k_neighbors,
                    preprocess_fn=pp_train, tokenizer=tokenizer,
                )
            )
        dm.data_train = ResampledDataset(sources, weights, seed=args.seed)
        if args.val_data:
            vroot = Path(args.val_data)
            dm.data_val = ShardedSpatialDataset(
                dataset_root=vroot, split=args.val_split,
                sample_ids=_resolve_sample_ids(args.val_split, vroot),
                k_neighbors=args.k_neighbors,
                preprocess_fn=pp_val, tokenizer=tokenizer,
            )
    elif fmt == "csv":
        from spatial_clip_tpu.data.datasets.csv_backend import CsvDataset

        dm.data_train = CsvDataset(
            args.train_data, pp_train, tokenizer, args.csv_img_key,
            args.csv_caption_key, args.csv_separator, args.k_neighbors,
        )
        if args.val_data:
            dm.data_val = CsvDataset(
                args.val_data, pp_val, tokenizer, args.csv_img_key,
                args.csv_caption_key, args.csv_separator, args.k_neighbors,
            )
    else:
        dm.prepare_data()
        dm.setup("fit")

    # loss selection (ref: main.py:505-524)
    if teacher is not None:
        loss = make_loss("distill", float32_logits=args.float32_logits)
    elif args.use_spatial_loss:
        loss = make_loss(
            "spatial",
            cap_logit_scale=args.cap_logit_scale,
            temp_reg_weight=args.temp_reg_weight,
            neighbor_alpha_scale=args.neighbor_alpha_scale,
            float32_logits=args.float32_logits,
            use_fused_kernel=args.use_fused_kernel,
        )
    elif args.siglip:
        loss = make_loss("siglip", dist_impl=args.loss_dist_impl)
    else:
        loss = make_loss("clip", float32_logits=args.float32_logits)

    steps_per_epoch = args.steps_per_epoch or len(dm.train_dataloader())
    total_steps = args.epochs * max(steps_per_epoch, 1)
    cfg = TrainerConfig(
        learning_rate=args.lr,
        weight_decay=args.wd,
        betas=(args.beta1, args.beta2),
        eps=args.eps,
        grad_clip_norm=args.grad_clip_norm,
        opt=args.opt,
        momentum=args.momentum,
        # --skip-scheduler: constant LR, no warmup/decay (ref: train.py:80)
        schedule="const" if args.skip_scheduler else args.lr_scheduler,
        warmup_steps=0 if args.skip_scheduler
        else min(args.warmup, max(total_steps // 10, 1)),
        total_steps=total_steps,
        grad_accum=args.accum_freq,
        grad_accum_mode=args.accum_mode,
        scan_steps=args.scan_steps,
        seed=args.seed,
        log_every=args.log_every_n_steps,
        ckpt_dir=str(out_dir / "checkpoints"),
        keep_ckpts=1 if args.delete_previous_checkpoint else 3,
        frozen_prefixes=_lock_prefixes(bundle, args),
        extra={
            "schedule_kwargs": (
                {
                    "cooldown_steps": (args.epochs_cooldown or 0)
                    * max(steps_per_epoch, 1),
                    "cooldown_power": args.lr_cooldown_power,
                    "cooldown_end_lr": args.lr_cooldown_end,
                }
                if args.lr_scheduler == "const-cooldown" and args.epochs_cooldown
                else {}
            )
        },
    )
    trainer = Trainer(bundle, loss=loss, config=cfg, teacher=teacher)
    loggers = make_loggers(args.report_to, str(out_dir),
                           wandb_project=args.wandb_project_name,
                           wandb_notes=args.wandb_notes)

    sync_proc = None
    if args.remote_sync:
        from spatial_clip_tpu.utils.file_sync import remote_sync, start_sync_process

        remote_run_dir = str(Path(args.remote_sync) / name)
        # one synchronous sync validates the destination before training
        # (ref: main.py:175-189)
        if not remote_sync(str(out_dir), remote_run_dir, args.remote_sync_protocol):
            raise RuntimeError(f"initial remote sync failed: {remote_run_dir}")
        sync_proc = start_sync_process(
            args.remote_sync_frequency, str(out_dir), remote_run_dir,
            args.remote_sync_protocol,
        )
        sync_proc.start()
    state, metrics = trainer.fit(
        lambda: dm.train_dataloader(),
        (lambda: dm.val_dataloader()) if dm.data_val is not None else None,
        epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        logger=loggers,
        resume=args.resume,
    )
    for zs_dir, zs_tag in ((args.imagenet_val, "imagenet"),
                           (args.imagenet_v2, "imagenetv2")):
        if not zs_dir:
            continue
        from spatial_clip_tpu.data.datasets.imagefolder import get_imagenet_loader
        from spatial_clip_tpu.train.zero_shot import imagenet_zero_shot_eval

        loader, classes = get_imagenet_loader(
            zs_dir, pp_val, batch_size=args.batch_size
        )
        # dirs named by ImageNet class are used as-is; the standard
        # 1000-class layout (named or numeric — ImageNetV2 ships "0".."999",
        # sorted numerically by the loader) uses the vendored metadata
        # order (ref: data.py:125 ImageNetV2Dataset). A numeric SUBSET of
        # dirs (e.g. 3, 7, ...) must map each dir to its metadata
        # classname explicitly — ImageFolderDataset labels by sorted
        # position, which would misalign with a 1000-way classifier.
        numeric = all(c.isdigit() for c in classes)
        if len(classes) == 1000:
            zs_names = None
        elif numeric:
            from spatial_clip_tpu.train.zero_shot import load_imagenet_metadata

            meta_names, _ = load_imagenet_metadata(args.zeroshot_templates)
            zs_names = [meta_names[int(c)] for c in classes]
        else:
            zs_names = classes
        zs = imagenet_zero_shot_eval(
            bundle, state.params, tokenizer, loader,
            template_set=args.zeroshot_templates,
            classnames=zs_names,
        )
        zs = {f"{zs_tag}-{k}" if zs_tag != "imagenet" else k: v
              for k, v in zs.items()}
        metrics.update(zs)
        log.info("%s zero-shot: %s", zs_tag, zs)

    (out_dir / "results.json").write_text(json.dumps(metrics, indent=2, default=float))
    if sync_proc is not None:
        from spatial_clip_tpu.utils.file_sync import remote_sync

        sync_proc.terminate()
        # final full sync so the remote has the finished run
        remote_sync(
            str(out_dir), str(Path(args.remote_sync) / name),
            args.remote_sync_protocol,
        )
    log.info("done: %s", metrics)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
