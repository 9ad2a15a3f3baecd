"""HuggingFace text encoder tower (ref: src/open_clip/hf_model.py:96-193
``HFTextEncoder`` + pooler variants :46-93, arch maps hf_configs.py).

Wraps a transformers Flax module (BERT/RoBERTa-family) as the text tower:
pooler types ``cls_pooler`` / ``mean_pooler`` / ``last`` / ``max_pooler``
and a linear or MLP projection to the CLIP embedding space. Pretrained hub
weights require network access (``from_pretrained``); offline construction
uses a local config (``hf_config`` dict) — this keeps the tower fully
testable in airgapped environments.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_ARCH_TO_MODULE = {
    "bert": ("transformers.models.bert.modeling_flax_bert", "FlaxBertModule",
             "transformers", "BertConfig"),
    "roberta": ("transformers.models.roberta.modeling_flax_roberta",
                "FlaxRobertaModule", "transformers", "RobertaConfig"),
    "xlm-roberta": (
        "transformers.models.xlm_roberta.modeling_flax_xlm_roberta",
        "FlaxXLMRobertaModule", "transformers", "XLMRobertaConfig",
    ),
    # encoder-only T5/mT5 (ref: hf_configs.py:30-44 "mt5" — layer_attr
    # "block", mean pooling); the flax T5 encoder takes (ids, mask) only
    "mt5": ("transformers.models.t5.modeling_flax_t5",
            "FlaxT5EncoderModule", "transformers", "MT5Config"),
    "t5": ("transformers.models.t5.modeling_flax_t5",
           "FlaxT5EncoderModule", "transformers", "T5Config"),
    # nllb-clip's text tower (ref: hf_configs.py:57-70). transformers>=4.50
    # dropped Flax M2M100, so the encoder is implemented natively
    # (models/m2m_encoder.py, torch-parity tested <=1e-4).
    "m2m_100": ("spatial_clip_tpu.models.m2m_encoder", "M2M100EncoderModule",
                "transformers", "M2M100Config"),
}

# encoder __call__ takes (input_ids, attention_mask) only — no token-type
# or position ids (relative position bias / sinusoidal positions instead)
_IDS_MASK_ONLY = {"mt5", "t5", "m2m_100"}


def _load_arch(arch: str):
    import importlib

    mod_path, mod_name, cfg_mod, cfg_name = _ARCH_TO_MODULE[arch]
    module_cls = getattr(importlib.import_module(mod_path), mod_name)
    config_cls = getattr(importlib.import_module(cfg_mod), cfg_name)
    return module_cls, config_cls


class HFTextTower(nn.Module):
    """Text tower backed by a transformers Flax encoder."""

    output_dim: int
    arch: str = "bert"
    hf_config: Optional[Dict[str, Any]] = None  # local config kwargs
    pooler_type: str = "mean_pooler"  # cls_pooler | mean_pooler | max_pooler | last
    proj_type: str = "linear"  # linear | mlp
    pad_id: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        module_cls, config_cls = _load_arch(self.arch)
        cfg = config_cls(**(self.hf_config or {}))
        self.hf = module_cls(cfg, dtype=self.dtype)
        self.hidden_size = getattr(cfg, "hidden_size", None) or cfg.d_model
        if self.proj_type == "mlp":
            hidden = (self.hidden_size + self.output_dim) // 2
            self.proj1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
            self.proj2 = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        else:
            self.proj1 = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
            self.proj2 = None

    def __call__(self, text: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_mask = (text != self.pad_id).astype(jnp.int32)
        if self.arch in _IDS_MASK_ONLY:
            out = self.hf(text, attn_mask, deterministic=deterministic)
        else:
            token_type = jnp.zeros_like(text)
            positions = jnp.broadcast_to(
                jnp.arange(text.shape[1])[None], text.shape
            )
            out = self.hf(
                text, attn_mask, token_type, positions,
                deterministic=deterministic,
            )
        hidden = out.last_hidden_state  # (B, L, H)
        maskf = attn_mask.astype(jnp.float32)[..., None]
        if self.pooler_type == "cls_pooler":
            pooled = hidden[:, 0]
        elif self.pooler_type == "max_pooler":
            pooled = jnp.where(maskf > 0, hidden, -jnp.inf).max(axis=1)
        elif self.pooler_type == "last":
            last_idx = attn_mask.sum(axis=1) - 1
            pooled = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]
        else:  # mean_pooler
            pooled = (hidden * maskf).sum(axis=1) / jnp.maximum(maskf.sum(axis=1), 1.0)
        x = self.proj1(pooled)
        if self.proj2 is not None:
            x = self.proj2(nn.gelu(x))
        return x


_ARCH_TO_FLAX_MODEL = {
    "bert": "FlaxBertModel",
    "roberta": "FlaxRobertaModel",
    "xlm-roberta": "FlaxXLMRobertaModel",
    "mt5": "FlaxT5EncoderModel",
    "t5": "FlaxT5EncoderModel",
}


def convert_torch_hf_state_dict(
    pt_state_dict: Dict[str, Any], arch: str = "bert",
    hf_config: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """torch HF encoder state dict -> the flax param subtree that slots in
    at ``params['text']['hf']`` of a :class:`HFTextTower` model.

    This is the offline weight-transfer path for the reference's
    ``HFTextEncoder(pretrained=True)`` surface (ref: hf_model.py:96-193) —
    hub downloads need network, but a local torch state dict converts
    through transformers' own pt->flax mapping (tested bit-parity in
    tests/test_torch_parity.py::test_hf_bert_weight_transfer_parity).
    """
    if arch == "m2m_100":
        from spatial_clip_tpu.models.m2m_encoder import (
            convert_torch_m2m_encoder,
        )

        return jax.tree.map(
            jnp.asarray, convert_torch_m2m_encoder(pt_state_dict))

    import transformers
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )

    _, config_cls = _load_arch(arch)
    cfg = config_cls(**(hf_config or {}))
    model_cls = getattr(transformers, _ARCH_TO_FLAX_MODEL[arch])
    flax_model = model_cls(cfg)
    return jax.tree.map(
        lambda x: jnp.asarray(x),
        convert_pytorch_state_dict_to_flax(pt_state_dict, flax_model),
    )


def load_torch_hf_weights(
    params: Dict[str, Any], pt_state_dict: Dict[str, Any],
    arch: str = "bert", hf_config: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Return a copy of a model ``params`` tree with the HF text encoder
    weights replaced by a converted torch state dict."""
    hf_params = convert_torch_hf_state_dict(pt_state_dict, arch, hf_config)
    out = dict(params)
    text = dict(out["text"])
    text["hf"] = hf_params
    out["text"] = text
    return out
