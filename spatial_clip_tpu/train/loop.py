"""Jitted training/eval loop (the L5 orchestration layer).

Replaces both reference stacks — Lightning ``SpatialClipLitModule``
(ref: src/models/spatial_clip_module.py) and the hand-written
``open_clip_train/train.py`` epoch loop — with one GSPMD design:

- the WHOLE train step (on-device normalize/augment -> two towers -> loss ->
  grads -> AdamW update -> logit-scale clamp -> metrics) is a single jitted
  function; params are replicated over the data axis, batches are sharded,
  and XLA inserts the loss's feature all-gathers as ICI collectives.
- gradient accumulation is a ``lax.scan`` over microbatches inside the same
  jit (ref: train.py:144-193's feature-caching accum path).
- metric states are sum-reducible pytrees carried on device.
"""
from __future__ import annotations

import logging
import math
import time
from dataclasses import dataclass, field as dfield
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatial_clip_tpu.losses import LossFn, make_loss
from spatial_clip_tpu.models.factory import ModelBundle
from spatial_clip_tpu.models.transforms import (
    augment_batch,
    augment_normalize_batch,
    normalize_batch,
)
from spatial_clip_tpu.parallel.mesh import make_mesh
from spatial_clip_tpu.train.checkpoints import CheckpointManager
from spatial_clip_tpu.train.metrics import (
    ContrastiveMetrics,
    clip_retrieval_metrics,
    recall_at_k,
)
from spatial_clip_tpu.train.optim import global_norm_f32, make_optimizer

log = logging.getLogger(__name__)

LOGIT_SCALE_MAX = math.log(100.0)  # ref: open_clip_train/train.py:219-220


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # master-weights mode: forward/backward run on this compute-dtype copy
    # of the >=2-D kernels (1-D leaves stay fp32 — bitwise-identical forward
    # to the per-use flax cast), while `params` stays the fp32 master the
    # optimizer updates and checkpoints store. None when disabled.
    live: Any = None


@dataclass
class TrainerConfig:
    learning_rate: float = 5e-4
    weight_decay: float = 0.2
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-6
    grad_clip_norm: Optional[float] = 1.0
    opt: str = "adamw"  # adamw | sgd | lion (ref: params.py --opt)
    momentum: Optional[float] = None  # sgd momentum (ref: --momentum)
    # Master-weights training (torch-AMP recipe): store the GEMM kernels in
    # the compute dtype for forward/backward (kills the per-step fp32->bf16
    # weight-convert pass) and keep an fp32 master for the update; kernel
    # grads arrive in bf16 (clip/metric norms accumulate in f32).
    master_weights: bool = False
    # 'bf16' halves the Adam first-moment HBM traffic (~0.7 ms/step at
    # ViT-B scale). Default since the synthetic quality gate
    # (reports/ab_mu.json, 2 seeds x 400 steps): loss curves and val R@1
    # match fp32-m within seed noise in both directions. Set None for the
    # reference's exact fp32 optimizer state.
    mu_dtype: Optional[str] = "bf16"
    # Reduced-precision Adam second moment (scale_by_adam_nd). 'bf16'
    # (default) halves the v read+write HBM traffic (-1.0 ms/step at ViT-B
    # scale, reports/ab_micro_r3.json) — quality-gated like mu_dtype
    # (reports/ab_nu.json: 2 seeds x 400 steps, loss/R@1 deltas in both
    # directions within seed noise). Set None for optax.adamw's exact fp32
    # optimizer state.
    nu_dtype: Optional[str] = "bf16"
    # Gradient materialization dtype. 'bf16' halves the backward's grad
    # writes + the optimizer pass's grad reads (the cast fuses into the
    # grad-producing fusions, so fp32 grads are never materialized). The
    # batch-sum itself still runs in the MXU's fp32 accumulators — only
    # the final per-weight value is rounded. None = fp32 (reference).
    grad_dtype: Optional[str] = None
    schedule: str = "cosine"
    warmup_steps: int = 500
    total_steps: int = 10_000
    grad_accum: int = 1
    # 'cached': reference semantics (train.py:144-193) — features for the
    #   FULL effective batch are computed grad-free, then each microbatch is
    #   re-embedded with grad against the cached global matrix, so the
    #   contrastive batch equals accum*microbatch at O(microbatch) activation
    #   memory. 'simple': average of per-microbatch losses.
    grad_accum_mode: str = "cached"
    augment: bool = True
    horizontal_flip_prob: float = 0.5
    color_jitter: Optional[float] = None
    seed: int = 42
    log_every: int = 10
    ckpt_dir: Optional[str] = None
    save_every_steps: Optional[int] = None
    keep_ckpts: int = 3
    max_logit_scale: float = LOGIT_SCALE_MAX
    frozen_prefixes: Tuple[str, ...] = ()  # e.g. ("visual",) = LiT image lock
    # callback parity (ref: configs/callbacks/default.yaml — ModelCheckpoint
    # monitors val/R@1 max, EarlyStopping patience)
    monitor: str = "R@1"
    monitor_mode: str = "max"
    # Per-step metric set. 'full' (default): loss + logit_scale + lr +
    # grad_norm + in-batch R@{1,5,10} every step — richer than the
    # reference. 'light': reference per-step parity (open_clip
    # train.py:244-259 logs loss/scale only; recalls are an eval-time
    # metric) — skips the in-batch top-k sorts and the duplicate
    # global-norm reduction (clipping computes its own inside optax).
    step_metrics: str = "full"
    early_stop_patience: Optional[int] = None
    # Per-jit XLA compiler overrides for the train/eval steps (e.g.
    # {"xla_tpu_scoped_vmem_limit_kib": "65536"}); None = backend defaults.
    compiler_options: Optional[Dict[str, str]] = None
    # Steps per dispatched program: >1 wraps the train step in a
    # lax.scan over a stacked batch (leading dim = scan_steps), executing
    # that many REAL optimizer steps (per-step rng/LR/step-count, exact
    # math) in one XLA program. Amortizes the per-program launch overhead
    # of the runtime; the fit loop stacks loader batches to feed it.
    # Returned step metrics are the last inner step's.
    scan_steps: int = 1
    extra: Dict[str, Any] = dfield(default_factory=dict)


def _prepare_images(images, mean, std, dtype, augment_cfg, rng):
    """uint8 host tiles -> normalized model input, fused on device."""
    if images.dtype == jnp.uint8:
        if augment_cfg is not None:
            return augment_normalize_batch(
                rng,
                images,
                mean,
                std,
                dtype,
                horizontal_flip_prob=augment_cfg["flip"],
                color_jitter=augment_cfg["jitter"],
            )
        return normalize_batch(images, mean, std, dtype)
    return images.astype(dtype)


class Trainer:
    """End-to-end trainer over a device mesh.

    The datamodule yields numpy batches with the reference collate schema
    (ref: spatial_datamodule.py:111-137): ``images`` (B,H,W,3) uint8,
    ``texts`` (B,L) int32 (or gene vectors), ``image_tile_ids``,
    ``text_tile_ids``, ``neighbor_tile_ids`` (B,k), ``neighbor_alphas`` (B,k),
    optional ``raw_text``.
    """

    def __init__(
        self,
        bundle: ModelBundle,
        loss: Optional[LossFn] = None,
        config: Optional[TrainerConfig] = None,
        mesh: Optional[Mesh] = None,
        teacher=None,
    ):
        self.bundle = bundle
        self.loss = loss or make_loss("clip")
        self.cfg = config or TrainerConfig()
        self.mesh = mesh or make_mesh()
        # optional frozen teacher bundle for distillation
        # (ref: main.py --distill-model path, loss.py DistillClipLoss)
        self.teacher = teacher
        self.tx, self.schedule = make_optimizer(
            bundle.params,
            learning_rate=self.cfg.learning_rate,
            weight_decay=self.cfg.weight_decay,
            betas=self.cfg.betas,
            eps=self.cfg.eps,
            grad_clip_norm=self.cfg.grad_clip_norm,
            opt=self.cfg.opt,
            momentum=self.cfg.momentum,
            mu_dtype=self.cfg.mu_dtype,
            nu_dtype=self.cfg.nu_dtype,
            schedule_name=self.cfg.schedule,
            warmup_steps=self.cfg.warmup_steps,
            total_steps=self.cfg.total_steps,
            frozen_prefixes=tuple(self.cfg.frozen_prefixes or ()),
            # schedule tail knobs, e.g. cooldown_steps/power/end_lr for
            # const-cooldown (ref: params.py --epochs-cooldown,
            # --lr-cooldown-power, --lr-cooldown-end)
            **(self.cfg.extra.get("schedule_kwargs") or {}),
        )
        self.metrics = ContrastiveMetrics()
        self.ckpt = (
            CheckpointManager(self.cfg.ckpt_dir, keep=self.cfg.keep_ckpts)
            if self.cfg.ckpt_dir
            else None
        )
        self._repl = NamedSharding(self.mesh, P())
        # hybrid DCN meshes (make_hybrid_mesh) carry an outer 'replica'
        # axis; the batch shards over (replica, data) so data parallelism
        # spans slices/processes, with gradient all-reduce riding DCN
        batch_axes = (
            ("replica", "data")
            if self.mesh.shape.get("replica", 1) > 1
            else "data"
        )
        self._batch_axes = batch_axes
        self._batch_sh = NamedSharding(self.mesh, P(batch_axes))
        # tensor parallelism: with a >1-sized 'model' mesh axis the params
        # (and, via propagation, the optimizer moments) are sharded per
        # parallel/sharding.infer_param_shardings; the train/eval jits then
        # rely on computation-follows-sharding instead of replicated
        # in_shardings. Beyond the reference (DDP-only, SURVEY §2.7).
        self._tp = self.mesh.shape.get("model", 1) > 1
        if self._tp:
            from spatial_clip_tpu.parallel.sharding import (
                infer_param_shardings,
            )

            self._param_sh = infer_param_shardings(bundle.params, self.mesh)
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------ state
    def _to_live(self, params):
        dt = self.bundle.model.dtype
        return jax.tree.map(
            lambda p: p.astype(dt) if p.ndim >= 2 else p, params
        )

    def init_state(self) -> TrainState:
        if self._tp:
            params = jax.device_put(self.bundle.params, self._param_sh)
            # jit so the moments inherit the param shardings by propagation
            opt_state = jax.jit(self.tx.init)(params)
            return TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), self._repl),
                params=params,
                opt_state=opt_state,
                rng=jax.device_put(
                    jax.random.PRNGKey(self.cfg.seed), self._repl
                ),
                live=(jax.jit(self._to_live)(params)
                      if self.cfg.master_weights else None),
            )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self.bundle.params,
            opt_state=self.tx.init(self.bundle.params),
            rng=jax.random.PRNGKey(self.cfg.seed),
            live=(self._to_live(self.bundle.params)
                  if self.cfg.master_weights else None),
        )
        return jax.device_put(state, self._repl)

    # ------------------------------------------------------------- train step
    def _forward_features(self, params, batch, rng, deterministic=False):
        cfg = self.cfg
        aug = (
            {"flip": cfg.horizontal_flip_prob, "jitter": cfg.color_jitter}
            if (cfg.augment and not deterministic)
            else None
        )
        rng_aug, rng_drop = jax.random.split(rng)
        images = _prepare_images(
            batch["images"],
            self.bundle.preprocess_cfg.mean,
            self.bundle.preprocess_cfg.std,
            self.bundle.model.dtype,
            aug,
            rng_aug,
        )
        return self.bundle.model.apply(
            {"params": params},
            images,
            batch["texts"],
            deterministic,
            rngs=None if deterministic else {"dropout": rng_drop},
        )

    def _teacher_features(self, batch, rng):
        """Distillation teacher forward (ref: open_clip_train main.py distill
        branch + loss.py:203-239): deterministic, grad-free features keyed as
        the DistillClipLoss expects; filtered out for non-distill losses."""
        t = self.teacher
        images = _prepare_images(
            batch["images"], t.preprocess_cfg.mean, t.preprocess_cfg.std,
            t.model.dtype, None, rng,
        )
        out = t.model.apply({"params": t.params}, images, batch["texts"], True)
        return {
            "dist_image_features": jax.lax.stop_gradient(out["image_features"]),
            "dist_text_features": jax.lax.stop_gradient(out["text_features"]),
            "dist_logit_scale": jax.lax.stop_gradient(out["logit_scale"]),
        }

    def _loss_and_metrics(self, params, batch, rng, deterministic=False):
        features = self._forward_features(params, batch, rng, deterministic)
        if self.teacher is not None:
            features = {**features, **self._teacher_features(batch, rng)}
        loss_out = self.loss(**{**batch, **features})
        loss = loss_out["contrastive_loss"]
        # in-batch logits for R@k (ref: spatial_clip_module.py:68-70)
        logits = (
            features["image_features"] @ features["text_features"].T
        ) * features["logit_scale"]
        return loss, (features, logits)

    def _cached_accum_grads(self, params, batch, rng, accum: int):
        """Cached-feature gradient accumulation (ref: open_clip_train/
        train.py:144-193): pass 1 embeds every microbatch grad-free; pass 2
        re-embeds each microbatch with grad, splices it into the cached
        global feature matrix, and backprops the FULL-batch loss — the
        contrastive batch is the full effective batch at microbatch-sized
        activation memory.

        SPATIAL losses are fully supported here — a beyond-reference
        capability (torch's accum path is non-spatial-only,
        open_clip_train/train.py:144-193): ``mb_loss`` hands the loss the
        FULL batch's tile ids / neighbor ids / alphas together with the
        assembled global feature matrix, so the vectorized soft-label build
        (losses/contrastive.py) indexes neighbors across microbatch
        boundaries exactly as in the monolithic step. Parity is enforced by
        tests/test_train_loop.py::test_cached_accum_matches_full_batch_grads
        (accum=4 spatial grads == full-batch spatial grads)."""
        mb_size = batch["images"].shape[0] // accum

        def split(x):
            return x.reshape((accum, mb_size) + x.shape[1:])

        mbs = jax.tree.map(split, batch)

        def fwd1(_, xs):
            mb, i = xs
            f = self._forward_features(
                params, mb, jax.random.fold_in(rng, i), deterministic=False
            )
            return None, (f["image_features"], f["text_features"])

        _, (img_f, txt_f) = jax.lax.scan(
            fwd1, None, (mbs, jnp.arange(accum))
        )
        D = img_f.shape[-1]
        all_img = jax.lax.stop_gradient(img_f.reshape(-1, D))
        all_txt = jax.lax.stop_gradient(txt_f.reshape(-1, D))

        def mb_loss(p, j):
            mb = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, j, 0, keepdims=False), mbs
            )
            f = self._forward_features(
                p, mb, jax.random.fold_in(rng, j), deterministic=False
            )
            start = j * mb_size
            img_asm = jax.lax.dynamic_update_slice(
                all_img, f["image_features"].astype(all_img.dtype), (start, 0)
            )
            txt_asm = jax.lax.dynamic_update_slice(
                all_txt, f["text_features"].astype(all_txt.dtype), (start, 0)
            )
            inputs = {
                **batch,
                "image_features": img_asm,
                "text_features": txt_asm,
                "logit_scale": f["logit_scale"],
            }
            if "logit_bias" in f:
                inputs["logit_bias"] = f["logit_bias"]
            return self.loss(**inputs)["contrastive_loss"]

        def body(g_acc, j):
            l, g = jax.value_and_grad(mb_loss, argnums=0)(params, j)
            return jax.tree.map(
                lambda a, gi: a + gi.astype(a.dtype), g_acc, g
            ), l

        # fp32 accumulator regardless of param dtype (bf16 under
        # master_weights) — microbatch sums must not lose mantissa
        zero = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        grads, losses = jax.lax.scan(body, zero, jnp.arange(accum))
        # metric logits over the full effective batch
        scale = jnp.exp(params["logit_scale"])
        logits = (all_img @ all_txt.T) * scale
        return losses[-1], logits, grads

    def make_train_step(self) -> Callable:
        cfg = self.cfg
        accum = max(1, cfg.grad_accum)

        def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
            # split (not pass through) so the donated rng buffer is never
            # returned unchanged from the jitted step
            rng, next_rng = jax.random.split(state.rng)
            fwd_params = state.live if cfg.master_weights else state.params

            def compute(params, mb, r):
                return self._loss_and_metrics(params, mb, r, deterministic=False)

            if accum == 1:
                (loss, (_, logits)), grads = jax.value_and_grad(
                    compute, has_aux=True
                )(fwd_params, batch, rng)
                if cfg.grad_dtype == "bf16":
                    grads = jax.tree.map(
                        lambda g: g.astype(jnp.bfloat16), grads
                    )
            elif cfg.grad_accum_mode == "cached":
                loss, logits, grads = self._cached_accum_grads(
                    fwd_params, batch, rng, accum
                )
            else:
                # microbatch scan: grads averaged; contrastive batch = microbatch
                def split(x):
                    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

                mbs = jax.tree.map(split, batch)

                def body(carry, xs):
                    g_acc, l_acc = carry
                    mb, i = xs
                    r = jax.random.fold_in(rng, i)
                    (l, (_f, _lg)), g = jax.value_and_grad(compute, has_aux=True)(
                        fwd_params, mb, r
                    )
                    return (
                        jax.tree.map(lambda a, gi: a + gi.astype(a.dtype),
                                     g_acc, g),
                        l_acc + l,
                    ), _lg

                # accumulate in fp32 even when fwd_params (and hence kernel
                # grads) are bf16 under master_weights — bf16 accumulation
                # loses mantissa across microbatches
                zero = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), fwd_params
                )
                (g_sum, l_sum), logits_all = jax.lax.scan(
                    body, (zero, 0.0), (mbs, jnp.arange(accum))
                )
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                loss = l_sum / accum
                logits = logits_all[-1]

            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            if cfg.master_weights:
                # updates carry the (bf16) grad dtype on kernel leaves; the
                # master must accumulate in fp32
                updates = jax.tree.map(
                    lambda u, p: u.astype(p.dtype), updates, state.params
                )
            params = optax.apply_updates(state.params, updates)
            # clamp logit scale to [0, ln 100] (ref: train.py:219-220)
            params = dict(params)
            params["logit_scale"] = jnp.clip(
                params["logit_scale"], 0.0, cfg.max_logit_scale
            )
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=new_opt,
                rng=next_rng,
                live=self._to_live(params) if cfg.master_weights else None,
            )
            step_metrics = {
                "loss": loss,
                "logit_scale": jnp.exp(params["logit_scale"]),
                "lr": self.schedule(state.step),
            }
            if cfg.step_metrics != "light":
                targets = jnp.arange(logits.shape[0], dtype=jnp.int32)
                step_metrics["grad_norm"] = global_norm_f32(grads)
                for k in (1, 5, 10):
                    step_metrics[f"R@{k}"] = recall_at_k(logits, targets, k)
            return new_state, step_metrics

        copts = self.cfg.compiler_options
        n_scan = max(1, cfg.scan_steps)
        batch_sh = self._batch_sh
        if n_scan > 1:
            # k real optimizer steps per dispatched program (exact math:
            # per-step rng split / LR / step counter); batch leaves carry a
            # leading (scan_steps,) dim, replicated across the mesh
            inner = step_fn
            axes = (self._batch_axes if isinstance(self._batch_axes, tuple)
                    else (self._batch_axes,))
            batch_sh = NamedSharding(self.mesh, P(None, *axes))

            def step_fn(state, batches):  # noqa: F811
                state, ms = jax.lax.scan(inner, state, batches)
                return state, jax.tree.map(lambda x: x[-1], ms)

        if self._tp:
            # params/moments arrive TP-sharded; let GSPMD propagate instead
            # of forcing replication
            return jax.jit(step_fn, in_shardings=(None, batch_sh),
                           donate_argnums=(0,), compiler_options=copts)
        return jax.jit(
            step_fn,
            in_shardings=(self._repl, batch_sh),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,),
            compiler_options=copts,
        )

    def make_eval_step(self) -> Callable:
        def eval_fn(state: TrainState, batch):
            loss, (features, logits) = self._loss_and_metrics(
                state.params, batch, jax.random.PRNGKey(0), deterministic=True
            )
            out = {
                "loss": loss,
                "logits": logits,
                "image_features": features["image_features"],
                "text_features": features["text_features"],
            }
            if "caption_logits" in features:
                # CoCa bundles: caption CE on the val split
                # (ref: open_clip_train/train.py:324-360
                # maybe_compute_generative_loss -> val_generative_loss)
                from spatial_clip_tpu.models.coca import coca_caption_loss

                out["generative_loss"] = coca_caption_loss(
                    features["caption_logits"], features["caption_labels"]
                )
            return out

        if self._tp:
            return jax.jit(eval_fn, in_shardings=(None, self._batch_sh))
        return jax.jit(
            eval_fn, in_shardings=(self._repl, self._batch_sh)
        )

    # ------------------------------------------------------------------- fit
    def _device_batch(
        self, batch: Dict[str, Any], stacked: bool = False
    ) -> Dict[str, jnp.ndarray]:
        arrs = {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray) and k != "raw_text"
        }
        if stacked:
            # scan_steps-stacked batches: leading (scan_steps,) dim is
            # replicated; the per-step batch dim shards as usual
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = (self._batch_axes if isinstance(self._batch_axes, tuple)
                    else (self._batch_axes,))
            return jax.device_put(
                arrs, NamedSharding(self.mesh, P(None, *axes))
            )
        return jax.device_put(arrs, self._batch_sh)

    @staticmethod
    def _group_batches(it, n):
        """Group n consecutive host batches into one stacked batch for the
        scan-of-steps train step (incomplete tail groups are dropped —
        webdataset-style epoch-boundary semantics). Warns when the drop is
        the WHOLE epoch (scan_steps > batches/epoch trains zero steps)."""
        group = []
        yielded = 0
        for b in it:
            group.append(b)
            if len(group) == n:
                keys = [k for k, v in group[0].items()
                        if isinstance(v, np.ndarray) and k != "raw_text"]
                yield {k: np.stack([g[k] for g in group]) for k in keys}
                group = []
                yielded += 1
        if group and not yielded:
            log.warning(
                "scan_steps=%d > %d batches in the epoch: ZERO optimizer "
                "steps will run — lower trainer.scan_steps (or raise the "
                "dataset size)", n, len(group),
            )
        elif group:
            log.info("scan grouping dropped %d tail batches (scan_steps=%d)",
                     len(group), n)

    def fit(
        self,
        train_iter_factory: Callable[[], Iterable[Dict[str, Any]]],
        val_iter_factory: Optional[Callable[[], Iterable[Dict[str, Any]]]] = None,
        epochs: int = 1,
        steps_per_epoch: Optional[int] = None,
        state: Optional[TrainState] = None,
        logger=None,
        resume: Optional[str] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        state = state if state is not None else self.init_state()
        if resume and self.ckpt:
            try:
                host = jax.tree.map(np.asarray, state.replace(live=None))
                restored, step = self.ckpt.restore(
                    host, None if resume == "latest" else int(resume)
                )
                if self.cfg.master_weights:
                    restored = restored.replace(
                        live=self._to_live(restored.params)
                    )
                # Re-place with the shardings init_state established (TP
                # param/moment layouts included) — a blanket replicated
                # device_put would silently defeat dp x tp after resume.
                target_sh = jax.tree.map(lambda x: x.sharding, state)
                state = jax.device_put(restored, target_sh)
                log.info("Resumed from step %d", step)
            except FileNotFoundError:
                log.info("No checkpoint found; starting fresh")
        if self._train_step is None:
            self._train_step = self.make_train_step()
        n_dev = self.mesh.devices.size
        last: Dict[str, float] = {}
        sign = 1.0 if self.cfg.monitor_mode == "max" else -1.0
        best_score = -float("inf")
        stale_evals = 0
        self.best_step = None
        for epoch in range(epochs):
            t_data = t_step = 0.0
            n_samples = 0
            t0 = time.perf_counter()
            n_scan = max(1, self.cfg.scan_steps)
            train_it = train_iter_factory()
            if n_scan > 1:
                train_it = self._group_batches(train_it, n_scan)
            for i, batch in enumerate(train_it):
                if steps_per_epoch is not None and i * n_scan >= steps_per_epoch:
                    break
                bsz = int(np.prod(batch["images"].shape[: 1 + (n_scan > 1)]))
                dbatch = self._device_batch(batch, stacked=n_scan > 1)
                t1 = time.perf_counter()
                state, metrics = self._train_step(state, dbatch)
                step_no = int(state.step)
                # under scan, step_no advances by n_scan per call: fire when
                # a multiple of the cadence was CROSSED, not only when hit
                crossed = (
                    lambda every: every and
                    step_no // every > (step_no - n_scan) // every
                )
                if crossed(self.cfg.log_every):
                    # float() conversion below blocks on fresh output buffers
                    # (donated-state buffers may report ready early)
                    metrics = {k: float(v) for k, v in metrics.items()}
                    t2 = time.perf_counter()
                    t_data += t1 - t0
                    t_step += t2 - t1
                    n_samples += bsz
                    pairs_per_sec = n_samples / max(t_data + t_step, 1e-9)
                    metrics.update(
                        {
                            "epoch": epoch,
                            "pairs_per_sec": pairs_per_sec,
                            "pairs_per_sec_per_chip": pairs_per_sec / n_dev,
                        }
                    )
                    last = metrics
                    if logger:
                        logger.log(step_no, {f"train/{k}": v for k, v in metrics.items()})
                    t_data = t_step = 0.0
                    n_samples = 0
                else:
                    t_data += t1 - t0
                    n_samples += bsz
                if (
                    self.ckpt
                    and self.cfg.save_every_steps
                    and crossed(self.cfg.save_every_steps)
                ):
                    self.ckpt.save(jax.tree.map(np.asarray, state.replace(live=None)), step_no)
                t0 = time.perf_counter()
            if val_iter_factory is not None:
                val_metrics = self.evaluate(state, val_iter_factory())
                last.update({f"val/{k}": v for k, v in val_metrics.items()})
                if logger:
                    logger.log(int(state.step), {f"val/{k}": v for k, v in val_metrics.items()})
                score = val_metrics.get(self.cfg.monitor)
                if score is not None:
                    if sign * score > best_score:
                        best_score = sign * score
                        stale_evals = 0
                        self.best_step = int(state.step)
                        if self.ckpt:
                            self.ckpt.save(
                                jax.tree.map(np.asarray, state.replace(live=None)),
                                int(state.step), last,
                            )
                    else:
                        stale_evals += 1
                        if (
                            self.cfg.early_stop_patience
                            and stale_evals >= self.cfg.early_stop_patience
                        ):
                            log.info(
                                "Early stopping at step %d (no %s improvement "
                                "for %d evals)",
                                int(state.step), self.cfg.monitor, stale_evals,
                            )
                            break
            if self.ckpt:
                self.ckpt.save(jax.tree.map(np.asarray, state.replace(live=None)), int(state.step), last)
        if self.ckpt:
            self.ckpt.wait()  # flush the in-flight async save before returning
        return state, last

    # ------------------------------------------------------------------ eval
    def evaluate(
        self, state: TrainState, val_iter: Iterable[Dict[str, Any]]
    ) -> Dict[str, float]:
        """Full-split retrieval eval (ref: open_clip_train/train.py:278-380):
        accumulates features over the whole split then computes bidirectional
        rank metrics + mean val loss + in-batch R@k."""
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        losses, img_feats, txt_feats = [], [], []
        gen_losses = []
        mstate = self.metrics.init()
        n_batches = 0
        for batch in val_iter:
            dbatch = self._device_batch(batch)
            out = self._eval_step(state, dbatch)
            losses.append(float(out["loss"]))
            if "generative_loss" in out:
                gen_losses.append(float(out["generative_loss"]))
            img_feats.append(np.asarray(out["image_features"]))
            txt_feats.append(np.asarray(out["text_features"]))
            logits = out["logits"]
            mstate = self.metrics.update(
                mstate, logits, jnp.arange(logits.shape[0], dtype=jnp.int32)
            )
            n_batches += 1
        if not n_batches:
            log.warning("evaluation split produced zero batches (split smaller than batch size?)")
            return {}
        result = {"loss": float(np.mean(losses))}
        if gen_losses:
            result["val_generative_loss"] = float(np.mean(gen_losses))
        result.update(self.metrics.compute(mstate))
        img = np.concatenate(img_feats)
        txt = np.concatenate(txt_feats)
        result.update(clip_retrieval_metrics(img, txt))
        result["num_samples"] = float(len(img))
        return result
