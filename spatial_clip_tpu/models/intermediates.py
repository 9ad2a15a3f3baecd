"""Model-level ``forward_intermediates`` API.

Parity surface: the reference's ``CLIP.forward_intermediates`` /
``CustomTextCLIP.forward_intermediates`` (ref: src/open_clip/model.py:356-
452, 552-650) and the tower-level variants (ref: src/open_clip/
transformer.py:825-891 VisionTransformer, :403-470 Transformer,
utils.py:94 feature_take_indices).

JAX design: the towers ``sow`` every block's token matrix into the
``intermediates`` collection (models/transformer.py Transformer.__call__),
so this wrapper is a pure function over params — it applies the model with
``mutable=['intermediates']``, selects the requested blocks, and
post-processes (final-norm, prefix split, NCHW reshape) functionally.
``stop_early`` is honored by applying a depth-pruned module variant
(flax ignores the unused deeper block params), so the skipped blocks are
never traced — the XLA-friendly equivalent of breaking out of the torch
block loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp

from spatial_clip_tpu.models.transformer import LayerNorm
from spatial_clip_tpu.ops.flops import feature_take_indices

Indices = Optional[Union[int, Sequence[int]]]


def _collect_blocks(inter_col: Dict[str, Any], n_blocks: int) -> List[jnp.ndarray]:
    """Sown 'intermediates' subtree -> ordered per-block token list."""
    out = []
    for i in range(n_blocks):
        entry = inter_col[f"block_{i}"]
        # flax sow stores a tuple of sown values (one per call)
        out.append(entry[0] if isinstance(entry, (tuple, list)) else entry)
    return out


def _apply_ln(ln_params: Dict[str, Any], x: jnp.ndarray, eps: float) -> jnp.ndarray:
    return LayerNorm(eps=eps).apply({"params": ln_params}, x)


def forward_intermediates(
    bundle,
    image: Optional[jnp.ndarray] = None,
    text: Optional[jnp.ndarray] = None,
    *,
    image_indices: Indices = None,
    text_indices: Indices = None,
    stop_early: bool = False,
    normalize: bool = True,
    normalize_intermediates: bool = False,
    intermediates_only: bool = False,
    image_output_fmt: str = "NCHW",
    image_output_extra_tokens: bool = False,
    text_output_fmt: str = "NLC",
    text_output_extra_tokens: bool = False,
    output_logits: bool = False,
    output_logit_scale_bias: bool = False,
    params: Optional[Dict[str, Any]] = None,
) -> Dict[str, Union[jnp.ndarray, List[jnp.ndarray]]]:
    """Forward pass returning selected per-block intermediates.

    Args mirror the reference exactly (ref: model.py:356-391): ``*_indices``
    take the last n blocks if int, all if None, or the listed (possibly
    negative) block ids; ``stop_early`` prunes the traced depth to the
    deepest requested block (only meaningful with ``intermediates_only`` —
    final features need the full tower); ``normalize_intermediates`` runs
    the tower's final norm over every intermediate; ``image_output_fmt``
    is 'NCHW' (reference default) or 'NLC'.
    """
    assert image_output_fmt in ("NCHW", "NLC"), "Output format must be one of NCHW or NLC."
    assert text_output_fmt == "NLC", "text tower emits NLC intermediates"
    cfg = bundle.cfg
    p = bundle.params if params is None else params
    output: Dict[str, Any] = {}
    if intermediates_only:
        # reference contract (model.py:394-397): intermediates-only disables
        # final-feature normalization and logits
        normalize = False
        output_logits = False
    if output_logits and (image is None or text is None):
        raise ValueError("output_logits requires both image and text inputs")

    # ---- tower support checks (ViT + text transformer; the exotic trunks
    # expose per-stage features through their own token APIs)
    v = cfg.vision_cfg
    if image is not None and (v.timm_model_name or not isinstance(v.layers, int)):
        raise ValueError(
            "forward_intermediates supports the ViT vision tower; "
            f"got timm/resnet trunk for {bundle.model_name!r}"
        )
    if text is not None and (cfg.gene_cfg is not None or cfg.text_cfg.hf_config
                             or cfg.text_cfg.hf_model_name):
        raise ValueError(
            "forward_intermediates supports the CLIP text transformer; "
            "gene-MLP/HF towers have no block-token contract"
        )

    img_take = (feature_take_indices(v.layers, image_indices)
                if image is not None else [])
    txt_take = (feature_take_indices(cfg.text_cfg.layers, text_indices)
                if text is not None else [])

    model = bundle.model
    if stop_early and intermediates_only:
        new_cfg = cfg
        if image is not None and img_take and max(img_take) + 1 < v.layers:
            new_cfg = dataclasses.replace(
                new_cfg,
                vision_cfg=dataclasses.replace(v, layers=max(img_take) + 1),
            )
        if text is not None and txt_take and \
                max(txt_take) + 1 < cfg.text_cfg.layers:
            new_cfg = dataclasses.replace(
                new_cfg,
                text_cfg=dataclasses.replace(
                    cfg.text_cfg, layers=max(txt_take) + 1
                ),
            )
        if new_cfg is not cfg:
            # clone() keeps every other module attribute (CoCa's
            # multimodal_layers/caption_queries etc.) intact
            model = model.clone(cfg=new_cfg)

    if image is not None:
        feats, mut = model.apply(
            {"params": p}, image, normalize,
            method=type(model).encode_image, mutable=["intermediates"],
        )
        blocks = _collect_blocks(
            mut["intermediates"]["visual"]["transformer"],
            model.cfg.vision_cfg.layers,
        )
        sel = [blocks[i] for i in img_take]
        if normalize_intermediates:
            sel = [_apply_ln(p["visual"]["ln_post"], xi, v.norm_eps)
                   for xi in sel]
        # one class prefix token (ref transformer.py:864-869)
        prefix = [y[:, :1] for y in sel]
        sel = [y[:, 1:] for y in sel]
        if image_output_fmt == "NCHW":
            B = image.shape[0]
            g = int(sel[0].shape[1] ** 0.5)
            sel = [y.reshape(B, g, g, -1).transpose(0, 3, 1, 2) for y in sel]
        output["image_intermediates"] = sel
        if image_output_extra_tokens:
            output["image_intermediates_prefix"] = prefix
        if not intermediates_only:
            output["image_features"] = feats

    if text is not None:
        feats, mut = model.apply(
            {"params": p}, text, normalize,
            method=type(model).encode_text, mutable=["intermediates"],
        )
        blocks = _collect_blocks(
            mut["intermediates"]["text"]["transformer"],
            model.cfg.text_cfg.layers,
        )
        sel = [blocks[i] for i in txt_take]
        if normalize_intermediates:
            sel = [_apply_ln(p["text"]["ln_final"], xi,
                             cfg.text_cfg.norm_eps) for xi in sel]
        # NOTE: the CLIP text transformer has no extra prefix tokens
        # (ref model.py:427); embed_cls appends at the END and is part of
        # the token stream, matching the reference's behavior
        output["text_intermediates"] = sel
        if not intermediates_only:
            output["text_features"] = feats

    scale = jnp.exp(p["logit_scale"])
    if output_logits:
        logits = scale * output["image_features"] @ output["text_features"].T
        if "logit_bias" in p:
            logits = logits + p["logit_bias"]
        output["image_logits"] = logits
        output["text_logits"] = logits.T
    if output_logit_scale_bias:
        output["logit_scale"] = scale
        if "logit_bias" in p:
            output["logit_bias"] = p["logit_bias"]
    return output
