"""Loss factory + signature-based dispatch.

The reference LitModule inspects the loss ``forward`` signature once and
filters ``{**features, **batch}`` down to accepted kwargs
(ref: src/models/spatial_clip_module.py:44,55-64). :class:`LossFn` carries
that contract explicitly: ``accepted_args`` names what the loss consumes, and
``__call__`` ignores everything else, so one training step serves every loss.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, FrozenSet, Optional

import jax.numpy as jnp

from spatial_clip_tpu.losses.contrastive import (  # noqa: F401
    build_spatial_soft_labels,
    clip_loss,
    gather_features,
    siglip_loss,
    spatial_loss,
)

_BASE_ARGS = frozenset({"image_features", "text_features", "logit_scale", "logit_bias"})
_SPATIAL_ARGS = _BASE_ARGS | {
    "image_tile_ids",
    "text_tile_ids",
    "neighbor_tile_ids",
    "neighbor_alphas",
}


@dataclass(frozen=True)
class LossFn:
    """A jit-friendly loss callable with an explicit kwarg contract."""

    name: str
    fn: Callable[..., Dict[str, jnp.ndarray]]
    accepted_args: FrozenSet[str]
    options: Dict[str, Any] = field(default_factory=dict)

    def __call__(self, axis_name: Optional[str] = None, **kwargs) -> Dict[str, jnp.ndarray]:
        picked = {k: v for k, v in kwargs.items() if k in self.accepted_args}
        missing = {
            a
            for a in self.accepted_args
            if a not in picked and a not in ("logit_bias",)
        }
        if missing:
            raise TypeError(f"loss '{self.name}' missing inputs: {sorted(missing)}")
        return self.fn(axis_name=axis_name, **picked)


def make_loss(kind: str = "clip", **options) -> LossFn:
    """Build a loss by name (ref: src/open_clip/factory.py:790-827 create_loss).

    kinds: ``clip`` | ``spatial`` | ``siglip``.
    """
    kind = kind.lower()
    if kind in ("clip", "cliploss"):
        fn = functools.partial(
            clip_loss,
            float32_logits=bool(options.get("float32_logits", True)),
        )
        return LossFn("clip", fn, _BASE_ARGS, options)
    if kind in ("spatial", "spatial_multi_positive", "globalmappingmultipositive"):
        fn = functools.partial(
            spatial_loss,
            cap_logit_scale=options.get("cap_logit_scale"),
            temp_reg_weight=float(options.get("temp_reg_weight", 0.0) or 0.0),
            float32_logits=bool(options.get("float32_logits", True)),
            neighbor_alpha_scale=float(options.get("neighbor_alpha_scale", 1.0) or 1.0),
            use_fused_kernel=bool(options.get("use_fused_kernel", False)),
        )
        return LossFn("spatial", fn, _SPATIAL_ARGS, options)
    if kind in ("spatial_ring", "ring"):
        from spatial_clip_tpu.losses.ring import ring_spatial_loss

        fn = functools.partial(
            ring_spatial_loss,
            cap_logit_scale=options.get("cap_logit_scale"),
            neighbor_alpha_scale=float(options.get("neighbor_alpha_scale", 1.0) or 1.0),
        )
        return LossFn("spatial_ring", fn, _SPATIAL_ARGS, options)
    if kind == "coca":
        from spatial_clip_tpu.models.coca import coca_caption_loss

        cap_w = float(options.get("caption_loss_weight", 2.0))
        con_w = float(options.get("contrastive_loss_weight", 1.0))
        pad_id = int(options.get("pad_id", 0))

        def coca_fn(
            image_features, text_features, logit_scale,
            caption_logits, caption_labels, logit_bias=None, axis_name=None,
        ):
            con = clip_loss(
                image_features, text_features, logit_scale,
                logit_bias=logit_bias, axis_name=axis_name,
            )["contrastive_loss"]
            cap = coca_caption_loss(caption_logits, caption_labels, pad_id=pad_id)
            if axis_name is not None:
                import jax.lax as lax

                cap = lax.pmean(cap, axis_name)
            return {
                "contrastive_loss": con_w * con + cap_w * cap,
                "caption_loss": cap,
            }

        return LossFn(
            "coca", coca_fn, _BASE_ARGS | {"caption_logits", "caption_labels"},
            options,
        )
    if kind in ("distill", "distill_clip"):
        from spatial_clip_tpu.losses.contrastive import distill_clip_loss

        fn = functools.partial(
            distill_clip_loss,
            float32_logits=bool(options.get("float32_logits", True)),
        )
        return LossFn(
            "distill",
            fn,
            _BASE_ARGS
            | {"dist_image_features", "dist_text_features", "dist_logit_scale"},
            options,
        )
    if kind in ("siglip", "sigmoid"):
        fn = functools.partial(
            siglip_loss, dist_impl=options.get("dist_impl", "shift")
        )
        return LossFn("siglip", fn, _BASE_ARGS, options)
    raise ValueError(f"unknown loss kind: {kind}")
