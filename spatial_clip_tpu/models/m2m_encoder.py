"""Native flax M2M100/NLLB text encoder (ref: src/open_clip/hf_configs.py:57-70
``m2m_100`` arch map; torch semantics from transformers
``M2M100Encoder``).

transformers >= 4.50 dropped the Flax M2M100 implementation, so the nllb-clip
text tower is implemented natively here: scaled word embeddings + pad-aware
sinusoidal positions (offset 2, zeroed pad row), pre-LN encoder layers
(self-attn -> ReLU FFN) and a final LayerNorm. Param names mirror the torch
module tree one-to-one so :func:`convert_torch_m2m_encoder` is a rename+
transpose, verified <=1e-4 against the live torch model in
tests/test_m2m_encoder.py.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass
class _EncoderOutput:
    last_hidden_state: jnp.ndarray


def sinusoidal_table(n_rows: int, dim: int, padding_idx: int) -> np.ndarray:
    """transformers M2M100SinusoidalPositionalEmbedding.get_embedding: the
    tensor2tensor layout — [sin | cos] concatenated, NOT interleaved."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) *
                  (-math.log(10000.0) / (half - 1)))
    ang = np.arange(n_rows, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_rows, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


class _M2MEncoderLayer(nn.Module):
    d_model: int
    heads: int
    ffn_dim: int
    dropout: float = 0.0            # residual dropout (torch cfg.dropout)
    attention_dropout: float = 0.0  # on attn probs
    activation_dropout: float = 0.0  # after the FFN activation
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_bias, deterministic: bool = True):
        B, L, D = x.shape
        hd = self.d_model // self.heads
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          param_dtype=jnp.float32, name="self_attn_layer_norm")
        h = ln(x)

        def proj(name, feats=None):
            return nn.Dense(feats or self.d_model, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)

        def drop(rate, name):
            return nn.Dropout(rate=rate, name=name)

        q = proj("self_attn.q_proj")(h) * (hd ** -0.5)
        k = proj("self_attn.k_proj")(h)
        v = proj("self_attn.v_proj")(h)
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, L, self.heads, hd)
        v = v.reshape(B, L, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        attn = attn + pad_bias  # (B, 1, 1, L) additive -inf on pad keys
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = drop(self.attention_dropout, "attn_drop")(
            attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, D)
        x = x + drop(self.dropout, "res_drop1")(
            proj("self_attn.out_proj")(ctx), deterministic=deterministic)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="final_layer_norm")(x)
        h = nn.relu(proj("fc1", self.ffn_dim)(h))
        h = drop(self.activation_dropout, "act_drop")(
            h, deterministic=deterministic)
        return x + drop(self.dropout, "res_drop2")(
            proj("fc2")(h), deterministic=deterministic)


class M2M100EncoderModule(nn.Module):
    """Drop-in ``hf`` submodule for HFTextTower (arch='m2m_100').

    ``config`` is a transformers ``M2M100Config`` (config class only — no
    torch dependency at runtime).
    """

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        cfg = self.config
        pad = cfg.pad_token_id
        scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                       param_dtype=jnp.float32, name="embed_tokens")
        x = emb(input_ids) * jnp.asarray(scale, self.dtype)

        # pad-aware positions: non-pad tokens count 1..n (+pad offset), pads
        # stay at padding_idx whose table row is zero
        mask = (input_ids != pad).astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + pad
        table = jnp.asarray(sinusoidal_table(
            cfg.max_position_embeddings + 2, cfg.d_model, pad))
        x = x + table[positions].astype(self.dtype)
        p_drop = float(getattr(cfg, "dropout", 0.0))
        x = nn.Dropout(rate=p_drop, name="embed_drop")(
            x, deterministic=deterministic)

        neg = jnp.finfo(jnp.float32).min
        pad_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        for i in range(cfg.encoder_layers):
            x = _M2MEncoderLayer(
                cfg.d_model, cfg.encoder_attention_heads,
                cfg.encoder_ffn_dim,
                dropout=p_drop,
                attention_dropout=float(getattr(cfg, "attention_dropout", 0.0)),
                activation_dropout=float(
                    getattr(cfg, "activation_dropout", 0.0)),
                dtype=self.dtype, name=f"layers.{i}",
            )(x, pad_bias, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="layer_norm")(x)
        return _EncoderOutput(last_hidden_state=x)


def convert_torch_m2m_encoder(pt_state_dict) -> dict:
    """torch M2M100 encoder state dict -> M2M100EncoderModule param tree.

    Accepts key prefixes ``model.encoder.``, ``encoder.`` or none (keys like
    ``layers.0.self_attn.q_proj.weight``). Linear weights transpose to flax
    kernels; LayerNorm weight->scale; embeddings copy as-is."""
    flat = {}
    for key, val in pt_state_dict.items():
        k = key
        for pre in ("model.encoder.", "encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        v = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach")
                       else val, dtype=np.float32)
        if k == "embed_tokens.weight":
            flat["embed_tokens/embedding"] = v
        elif k.endswith(".weight") and v.ndim == 2:
            flat[k[: -len(".weight")] + "/kernel"] = v.T
        elif k.endswith(".weight"):
            flat[k[: -len(".weight")] + "/scale"] = v
        elif k.endswith(".bias"):
            flat[k[: -len(".bias")] + "/bias"] = v
        # sinusoidal position buffers are recomputed, not stored
    tree: dict = {}
    for k, v in flat.items():
        parts = k.replace(".", "/").split("/")
        # rejoin the "layers/N" and "self_attn/x_proj" segments into the
        # module names used above ("layers.N", "self_attn.q_proj")
        node = tree
        path = []
        i = 0
        while i < len(parts) - 1:
            p = parts[i]
            if p == "layers" and i + 1 < len(parts) - 1:
                p = f"layers.{parts[i + 1]}"
                i += 1
            elif p == "self_attn" and i + 1 < len(parts) - 1:
                p = f"self_attn.{parts[i + 1]}"
                i += 1
            path.append(p)
            node = node.setdefault(p, {})
            i += 1
        node[parts[-1]] = v
    return tree
