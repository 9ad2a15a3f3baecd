"""Optimizers & LR schedules (optax).

Ref: open_clip_train/main.py:338-366 (AdamW with gain/bias no-decay split)
and open_clip_train/scheduler.py (cosine / const / const-cooldown closures) —
re-expressed as optax schedules + a masked AdamW.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> Any:
    """True for params that receive weight decay.

    The reference excludes biases, norm gains, and ``logit_scale`` by the
    ``ndim < 2`` rule (main.py:342-349); we apply the same shape rule.
    """
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def cosine_lr(base_lr: float, warmup_steps: int, total_steps: int, end_lr: float = 0.0):
    """Linear warmup then cosine decay (ref: scheduler.py cosine_lr)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=end_lr,
    )


def const_lr(base_lr: float, warmup_steps: int = 0, **_):
    if warmup_steps <= 0:
        return optax.constant_schedule(base_lr)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup_steps),
         optax.constant_schedule(base_lr)],
        [warmup_steps],
    )


def const_lr_cooldown(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    """Constant LR with a polynomial cooldown tail (ref: scheduler.py)."""
    start_cd = total_steps - cooldown_steps

    def cooldown(step):
        frac = jnp.clip(step / max(cooldown_steps, 1), 0.0, 1.0)
        decay = (1.0 - frac) ** cooldown_power
        return cooldown_end_lr + decay * (base_lr - cooldown_end_lr)

    return optax.join_schedules(
        [const_lr(base_lr, warmup_steps), cooldown], [start_cd]
    )


def make_schedule(
    name: str,
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    **kwargs,
):
    name = (name or "cosine").lower()
    if name in ("cosine", "cosine_lr"):
        return cosine_lr(base_lr, warmup_steps, total_steps)
    if name in ("const", "constant"):
        return const_lr(base_lr, warmup_steps)
    if name in ("const-cooldown", "const_cooldown"):
        return const_lr_cooldown(
            base_lr, warmup_steps, total_steps,
            kwargs.get("cooldown_steps", max(total_steps // 10, 1)),
            kwargs.get("cooldown_power", 1.0),
            kwargs.get("cooldown_end_lr", 0.0),
        )
    raise ValueError(f"unknown schedule: {name}")


def freeze_mask(params, frozen_prefixes: Tuple[str, ...]) -> Any:
    """True for params under a frozen top-level tower.

    The JAX analogue of LiT-style tower locking
    (ref: open_clip_train/main.py:276-298 lock_image_tower/lock_text_tower,
    model.py lock methods): instead of requires_grad=False, frozen subtrees
    get zeroed updates so they never move (and carry no optimizer state
    semantics that matter).
    """
    flat = {}

    def walk(tree, path):
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = any(
                    "/".join(p).startswith(pref.rstrip("/")) for pref in frozen_prefixes
                )

    walk(params, ())

    def rebuild(tree, path):
        return {
            k: rebuild(v, path + (k,)) if isinstance(v, dict) else flat[path + (k,)]
            for k, v in tree.items()
        }

    return rebuild(params, ())




def global_norm_f32(tree) -> jnp.ndarray:
    """Global grad norm with fp32 accumulation regardless of leaf dtype —
    summing squares in bf16 (master-weights mode stores kernel grads in
    bf16) would lose the norm entirely."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves
    ))


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm with fp32 norm accumulation (identical for
    fp32 grads; required for bf16 grads)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g = global_norm_f32(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g, 1e-16))
        updates = jax.tree.map(
            lambda u: (u.astype(jnp.float32) * scale).astype(u.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _moment_dtype(name: Optional[str]):
    return jnp.bfloat16 if name in ("bf16", "bfloat16") else None


def scale_by_adam_nd(
    b1: float, b2: float, eps: float,
    mu_dtype=None, nu_dtype=None,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with an independent second-moment dtype.

    Exact Adam math (all arithmetic in fp32; bias correction via
    count_inc like optax); moments are merely STORED in ``mu_dtype`` /
    ``nu_dtype``. With both None this is bit-compatible with
    ``optax.scale_by_adam`` (tests enforce it). ``nu_dtype='bf16'``
    halves the second-moment HBM read+write in the fused optimizer pass —
    v >= 0 uses only bf16's exponent+7-bit mantissa, perturbing
    1/(sqrt(v)+eps) by <=0.4%, far below gradient noise (quality-gated
    like mu_dtype; reports/ab_mu.json methodology)."""

    def init(params):
        def zeros(dt):
            return jax.tree.map(
                lambda p: jnp.zeros(p.shape, dt or p.dtype), params
            )

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros(mu_dtype),
            nu=zeros(nu_dtype),
        )

    def update(updates, state, params=None):
        del params
        count_inc = optax.safe_int32_increment(state.count)

        def new_mu(g, m):
            return b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32)

        def new_nu(g, v):
            g32 = g.astype(jnp.float32)
            return b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32

        mu32 = jax.tree.map(new_mu, updates, state.mu)
        nu32 = jax.tree.map(new_nu, updates, state.nu)
        bc1 = 1 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1 - b2 ** count_inc.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32
        )
        cast = lambda t, dt: (jax.tree.map(lambda x: x.astype(dt), t)
                              if dt is not None else t)
        return out, optax.ScaleByAdamState(
            count=count_inc, mu=cast(mu32, mu_dtype), nu=cast(nu32, nu_dtype)
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    params,
    learning_rate: float = 5e-4,
    weight_decay: float = 0.2,
    betas: Tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-6,
    grad_clip_norm: Optional[float] = 1.0,
    schedule_name: str = "cosine",
    warmup_steps: int = 2000,
    total_steps: int = 100_000,
    frozen_prefixes: Tuple[str, ...] = (),
    opt: str = "adamw",
    momentum: Optional[float] = None,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
    **schedule_kwargs,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Optimizer + global-norm clipping + schedule, with the reference's
    no-decay split (main.py:338-366; trainer grad_clip_val=1.0 per
    configs/trainer/default.yaml) and optional tower locking
    (``frozen_prefixes=("visual",)`` locks the image tower).

    ``opt``: adamw (default) | sgd | lion (ref: params.py --opt/--momentum,
    main.py:318-366 create_optimizer branch)."""
    schedule = make_schedule(
        schedule_name, learning_rate, warmup_steps, total_steps, **schedule_kwargs
    )
    chain = []
    if grad_clip_norm:
        chain.append(clip_by_global_norm_f32(grad_clip_norm))
    opt = (opt or "adamw").lower()
    if opt in ("adamw", "adam"):
        if nu_dtype is not None:
            # custom Adam core with reduced-precision second moment
            # (optax.adamw has no nu_dtype); same chain as optax.adamw:
            # scale_by_adam -> masked decay -> lr
            chain.extend([
                scale_by_adam_nd(
                    betas[0], betas[1], eps,
                    mu_dtype=_moment_dtype(mu_dtype),
                    nu_dtype=_moment_dtype(nu_dtype),
                ),
                optax.add_decayed_weights(weight_decay, decay_mask(params)),
                optax.scale_by_learning_rate(schedule),
            ])
        else:
            chain.append(
                optax.adamw(
                    learning_rate=schedule,
                    b1=betas[0],
                    b2=betas[1],
                    eps=eps,
                    weight_decay=weight_decay,
                    mask=decay_mask(params),
                    # optional bf16 first moment: halves the m read+write in
                    # the fused optimizer pass (~0.7 ms/step on ViT-B); fp32
                    # default keeps reference AMP semantics
                    mu_dtype=_moment_dtype(mu_dtype),
                )
            )
    elif opt == "sgd":
        if weight_decay:
            chain.append(
                optax.masked(
                    optax.add_decayed_weights(weight_decay), decay_mask(params)
                )
            )
        chain.append(
            optax.sgd(learning_rate=schedule,
                      momentum=0.9 if momentum is None else momentum)
        )
    elif opt == "lion":
        chain.append(
            optax.lion(
                learning_rate=schedule,
                b1=betas[0],
                b2=betas[1],
                weight_decay=weight_decay,
                mask=decay_mask(params),
            )
        )
    else:
        raise ValueError(f"unknown optimizer: {opt}")
    if frozen_prefixes:
        frozen = freeze_mask(params, tuple(frozen_prefixes))
        chain.append(
            optax.masked(optax.set_to_zero(), frozen)
        )
    return optax.chain(*chain), schedule
