"""CoCa: contrastive + captioning two-tower model.

Re-design of the reference CoCa (ref: src/open_clip/coca_model.py:89-582,
multimodal decoder ref: src/open_clip/transformer.py:1250-1455
``MultimodalTransformer``): a ViT image tower with attentional pooling
(one contrastive query + N caption queries), a cls-pooled text tower, and a
causal multimodal decoder whose cross-attention reads the caption queries.
``generate`` is greedy decoding as a ``lax.scan`` (static length, jittable) —
the TPU-friendly replacement for the reference's Python beam search
(coca_model.py:286-413); sampled/beam variants can wrap the same step fn.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spatial_clip_tpu.models.clip import l2_normalize
from spatial_clip_tpu.models.config import CLIPCfg
from spatial_clip_tpu.models.transformer import (
    LayerNorm,
    MLP,
    MultiHeadAttention,
    TextTransformer,
    VisionTransformer,
    quick_gelu,
)

Dtype = Any


class CrossAttention(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        B, Lq, _ = x.shape
        Lk = context.shape[1]
        head_dim = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        kv = nn.Dense(2 * self.width, dtype=self.dtype, param_dtype=jnp.float32, name="kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, Lq, self.heads, head_dim)
        k = k.reshape(B, Lk, self.heads, head_dim)
        v = v.reshape(B, Lk, self.heads, head_dim)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, Lq, self.width)
        return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="out")(out)


class MultimodalBlock(nn.Module):
    """Causal self-attn + cross-attn + MLP (ref: transformer.py:1250+)."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, attn_mask=None):
        h = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln_1")(x)
        x = x + MultiHeadAttention(
            width=self.width, heads=self.heads, dtype=self.dtype, name="attn"
        )(h, attn_mask)
        h = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln_1_kv")(x)
        x = x + CrossAttention(
            width=self.width, heads=self.heads, dtype=self.dtype, name="cross_attn"
        )(h, context)
        h = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln_2")(x)
        x = x + MLP(
            width=self.width, hidden=int(self.width * self.mlp_ratio),
            dtype=self.dtype, name="mlp",
        )(h)
        return x


class MultimodalTransformer(nn.Module):
    width: int
    layers: int
    heads: int
    context_length: int
    vocab_size: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_embs: jnp.ndarray, image_ctx: jnp.ndarray):
        L = token_embs.shape[1]
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((L, L), neg), k=1)[None, None]
        x = token_embs
        for i in range(self.layers):
            x = MultimodalBlock(
                width=self.width, heads=self.heads, mlp_ratio=self.mlp_ratio,
                norm_eps=self.norm_eps, dtype=self.dtype, name=f"resblocks_{i}",
            )(x, image_ctx, causal)
        x = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln_final")(x)
        logits = nn.Dense(
            self.vocab_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="to_logits",
        )(x)
        return logits


class CoCa(nn.Module):
    """ref: coca_model.py:89-285. ``text`` tokens end with EOT; the text
    tower's cls embedding provides the contrastive feature, the multimodal
    decoder predicts the next token over the caption."""

    cfg: CLIPCfg
    multimodal_layers: int = 6
    caption_queries: int = 64
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        v = self.cfg.vision_cfg
        t = self.cfg.text_cfg
        act = quick_gelu if self.cfg.quick_gelu else nn.gelu
        image_size = v.image_size if isinstance(v.image_size, int) else v.image_size[0]
        self.visual = VisionTransformer(
            image_size=image_size,
            patch_size=v.patch_size,
            width=v.width,
            layers=v.layers,
            heads=v.heads,
            mlp_ratio=v.mlp_ratio,
            output_dim=self.cfg.embed_dim,
            attentional_pool=True,
            attn_pooler_queries=self.caption_queries + 1,
            attn_pooler_heads=v.attn_pooler_heads,
            pool_type="tok",
            norm_eps=v.norm_eps,
            dtype=self.dtype,
            act=act,
            remat=self.remat,
            output_tokens=True,
        )
        self.text = TextTransformer(
            context_length=t.context_length,
            vocab_size=t.vocab_size,
            width=t.width,
            heads=t.heads,
            layers=t.layers,
            mlp_ratio=t.mlp_ratio,
            output_dim=self.cfg.embed_dim,
            embed_cls=True,
            pad_id=t.pad_id,
            norm_eps=t.norm_eps,
            dtype=self.dtype,
            act=act,
            remat=self.remat,
        )
        self.token_embedding_dec = nn.Embed(
            t.vocab_size, t.width, dtype=self.dtype, param_dtype=jnp.float32,
        )
        self.img_to_text_width = nn.Dense(
            t.width, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.decoder = MultimodalTransformer(
            width=t.width,
            layers=self.multimodal_layers,
            heads=t.heads,
            context_length=t.context_length,
            vocab_size=t.vocab_size,
            norm_eps=t.norm_eps,
            dtype=self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.cfg.init_logit_scale), (),
            jnp.float32,
        )
        self.dec_positional_embedding = self.param(
            "dec_positional_embedding", nn.initializers.normal(0.01),
            (self.cfg.text_cfg.context_length, self.cfg.text_cfg.width),
            jnp.float32,
        )

    def _encode_image_full(self, images, deterministic=True):
        pooled, tokens = self.visual(images, deterministic=deterministic)
        # pooled = projected first attn-pool query; tokens = caption queries
        return pooled, tokens

    def encode_image(self, images, normalize: bool = True, deterministic=True):
        pooled, _ = self._encode_image_full(images, deterministic)
        return l2_normalize(pooled) if normalize else pooled

    def encode_text(self, text, normalize: bool = True, deterministic=True):
        feats = self.text(text, deterministic=deterministic)
        return l2_normalize(feats) if normalize else feats

    def decode(self, text_in: jnp.ndarray, image_tokens: jnp.ndarray) -> jnp.ndarray:
        ctx = self.img_to_text_width(image_tokens)
        embs = self.token_embedding_dec(text_in)
        pos = self.dec_positional_embedding
        embs = embs + pos[None, : embs.shape[1]].astype(self.dtype)
        return self.decoder(embs, ctx)

    def __call__(
        self,
        images: Optional[jnp.ndarray] = None,
        text: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {"logit_scale": jnp.exp(self.logit_scale)}
        tokens = None
        if images is not None:
            pooled, tokens = self._encode_image_full(images, deterministic)
            out["image_features"] = l2_normalize(pooled)
        if text is not None:
            out["text_features"] = self.encode_text(text, deterministic=deterministic)
        if images is not None and text is not None:
            # teacher forcing: predict text[:, 1:] from text[:, :-1]
            out["caption_logits"] = self.decode(text[:, :-1], tokens)
            out["caption_labels"] = text[:, 1:]
        return out


def coca_caption_loss(
    caption_logits: jnp.ndarray, caption_labels: jnp.ndarray, pad_id: int = 0
) -> jnp.ndarray:
    """Token-level CE over non-pad positions (ref: loss.py:158-200 CoCaLoss)."""
    logp = jax.nn.log_softmax(caption_logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, caption_labels[..., None], axis=-1)[..., 0]
    mask = (caption_labels != pad_id).astype(jnp.float32)
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def beam_search_generate(
    model: CoCa,
    params,
    images: jnp.ndarray,
    sot_token: int,
    eot_token: int,
    max_len: int = 30,
    beam_size: int = 4,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Beam-search caption decoding (ref: coca_model.py:413-582
    ``_generate_beamsearch``) as a single jittable ``lax.scan`` — beams are a
    static batch dimension, candidate selection is a top-k over beam x vocab,
    finished beams keep their score and emit padding."""
    NEG = -1e9
    B = images.shape[0]
    ctx_len = model.cfg.text_cfg.context_length
    vocab = model.cfg.text_cfg.vocab_size
    image_tokens = model.apply(
        {"params": params}, images, method=CoCa._encode_image_full
    )[1]
    # tile image context across beams: (B*beam, Lq, D)
    tiled = jnp.repeat(image_tokens, beam_size, axis=0)

    def apply_decode(text_in):
        return model.apply({"params": params}, text_in, tiled, method=CoCa.decode)

    seq0 = jnp.zeros((B, beam_size, ctx_len), jnp.int32).at[:, :, 0].set(sot_token)
    scores0 = jnp.where(
        jnp.arange(beam_size)[None, :] == 0, 0.0, NEG
    ) * jnp.ones((B, 1))
    done0 = jnp.zeros((B, beam_size), bool)

    def step(carry, i):
        seq, scores, done = carry
        logits = apply_decode(seq.reshape(B * beam_size, ctx_len)[:, : ctx_len - 1])
        logp = jax.nn.log_softmax(logits[:, i].astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, beam_size, vocab)
        # finished beams: only a zero-cost pad continuation survives
        pad_only = jnp.full((vocab,), NEG).at[0].set(0.0)
        logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)
        cand = scores[:, :, None] + logp  # (B, beam, V)
        flat = cand.reshape(B, beam_size * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, beam_size)
        beam_idx = top_idx // vocab
        tok_idx = (top_idx % vocab).astype(jnp.int32)
        seq = jnp.take_along_axis(seq, beam_idx[:, :, None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        seq = jax.lax.dynamic_update_slice(
            seq, tok_idx[:, :, None], (0, 0, i + 1)
        )
        done = done | (tok_idx == eot_token)
        return (seq, top_scores, done), None

    (seq, scores, done), _ = jax.lax.scan(
        # max_len counts the SOT (reference seq_len semantics)
        step, (seq0, scores0, done0), jnp.arange(min(max_len - 1, ctx_len - 1))
    )
    # length-penalized best beam (ref: coca_model.py length_penalty)
    lengths = (seq != 0).sum(axis=-1).astype(jnp.float32)
    norm = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    best = jnp.argmax(norm, axis=1)
    return jnp.take_along_axis(seq, best[:, None, None], axis=1)[:, 0]


def _top_k_warp(logits: jnp.ndarray, k: int, neg: float = -1e9) -> jnp.ndarray:
    """Keep the k most probable tokens (ref: coca_model.py:32-40
    TopKLogitsWarper semantics; ties at the threshold are all kept)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, neg, logits)


def _top_p_warp(
    logits: jnp.ndarray, p: float, min_tokens_to_keep: int = 1, neg: float = -1e9
) -> jnp.ndarray:
    """Nucleus filtering: drop the low-probability tail whose ascending
    cumulative mass is <= 1-p (ref: coca_model.py:32-40 TopPLogitsWarper
    semantics), always keeping at least ``min_tokens_to_keep`` tokens."""
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove = cum <= (1.0 - p)
    remove = remove.at[..., -min_tokens_to_keep:].set(False)
    kept_min = jnp.min(
        jnp.where(remove, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    return jnp.where(logits < kept_min, neg, logits)


def sample_generate(
    model: CoCa,
    params,
    images: jnp.ndarray,
    sot_token: int,
    eot_token: int,
    rng: jax.Array,
    max_len: int = 30,
    generation_type: str = "top_p",
    top_p: float = 0.1,
    top_k: int = 1,
    temperature: float = 1.0,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    pad_token: int = 0,
) -> jnp.ndarray:
    """Sampled caption decoding with top-k / top-p logit warping as one
    jittable ``lax.scan`` (ref: coca_model.py:286-413 ``generate`` with
    TopK/TopPLogitsWarper + MinLength/RepetitionPenalty processors).

    TPU-native formulation: static shapes (seq buffer is context_length),
    warpers are sort/top_k-based masks, the per-row "finished" state emits
    pad, and the final step forces EOS — all inside the scan so the whole
    decode is one compiled program.
    """
    if generation_type not in ("top_p", "top_k"):
        raise ValueError(
            "generation_type has to be one of | top_k | top_p | beam_search |."
        )

    def apply_decode(text_in, tokens):
        return model.apply({"params": params}, text_in, tokens, method=CoCa.decode)

    image_tokens = model.apply(
        {"params": params}, images, method=CoCa._encode_image_full
    )[1]
    B = images.shape[0]
    ctx_len = model.cfg.text_cfg.context_length
    vocab = model.cfg.text_cfg.vocab_size
    NEG = -1e9
    # max_len counts the SOT like the reference's seq_len (generate forces
    # EOS when TOTAL length incl. SOT reaches seq_len, coca_model.py:286-413)
    # -> max_len - 1 tokens are emitted after the SOT
    n_steps = min(max_len - 1, ctx_len - 1)

    def step(carry, i):
        seq, done, key = carry
        key, sub = jax.random.split(key)
        logits = apply_decode(seq[:, : ctx_len - 1], image_tokens)
        logits = logits[:, i].astype(jnp.float32)
        # MinLengthLogitsProcessor: no EOS before min_seq_len tokens
        logits = jnp.where(
            (i + 1 < min_seq_len)
            & (jnp.arange(vocab)[None, :] == eot_token),
            NEG,
            logits,
        )
        if repetition_penalty != 1.0:
            # presence of each token in the generated prefix (positions
            # <= i); OOB sentinel column keeps masked positions out
            valid = jnp.arange(ctx_len)[None, :] <= i
            idx = jnp.where(valid, seq, vocab)
            presence = (
                jnp.zeros((B, vocab + 1), bool)
                .at[jnp.arange(B)[:, None], idx]
                .set(True)[:, :vocab]
            )
            penalized = jnp.where(
                logits > 0, logits / repetition_penalty, logits * repetition_penalty
            )
            logits = jnp.where(presence, penalized, logits)
        if generation_type == "top_k":
            logits = _top_k_warp(logits, top_k, NEG)
        else:
            logits = _top_p_warp(logits, top_p, neg=NEG)
        next_tok = jax.random.categorical(sub, logits / temperature, axis=-1)
        next_tok = next_tok.astype(jnp.int32)
        # the final emitted token is forced to EOS (ref: cur_len+1==seq_len)
        next_tok = jnp.where(i == n_steps - 1, eot_token, next_tok)
        next_tok = jnp.where(done, pad_token, next_tok)
        seq = jax.lax.dynamic_update_slice(seq, next_tok[:, None], (0, i + 1))
        done = done | (next_tok == eot_token)
        return (seq, done, key), None

    seq0 = jnp.zeros((B, ctx_len), jnp.int32).at[:, 0].set(sot_token)
    (seq, _, _), _ = jax.lax.scan(
        step, (seq0, jnp.zeros((B,), bool), rng), jnp.arange(n_steps)
    )
    return seq


def generate(
    model: CoCa,
    params,
    images: jnp.ndarray,
    sot_token: int = 49406,
    eot_token: int = 49407,
    seq_len: int = 30,
    generation_type: str = "beam_search",
    rng: Optional[jax.Array] = None,
    top_p: float = 0.1,
    top_k: int = 1,
    temperature: float = 1.0,
    num_beams: int = 6,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Unified generation dispatcher mirroring the reference's surface
    (ref: coca_model.py:286-340): beam_search / top_k / top_p, plus
    'greedy' as a TPU-native extra. Sampled types need ``rng``."""
    if generation_type == "beam_search":
        return beam_search_generate(
            model, params, images, sot_token, eot_token,
            max_len=seq_len, beam_size=num_beams, length_penalty=length_penalty,
        )
    if generation_type == "greedy":
        return greedy_generate(
            model, params, images, sot_token, eot_token, max_len=seq_len
        )
    if generation_type in ("top_k", "top_p"):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return sample_generate(
            model, params, images, sot_token, eot_token, rng,
            max_len=seq_len, generation_type=generation_type,
            top_p=top_p, top_k=top_k, temperature=temperature,
            min_seq_len=min_seq_len, repetition_penalty=repetition_penalty,
        )
    raise ValueError(
        "generation_type has to be one of "
        "| greedy | top_k | top_p | beam_search |."
    )


def greedy_generate(
    model: CoCa,
    params,
    images: jnp.ndarray,
    sot_token: int,
    eot_token: int,
    max_len: int = 30,
) -> jnp.ndarray:
    """Greedy caption decoding as a jittable lax.scan (static max_len)."""

    def apply_decode(text_in, tokens):
        return model.apply({"params": params}, text_in, tokens, method=CoCa.decode)

    pooled_tokens = model.apply(
        {"params": params}, images, method=CoCa._encode_image_full
    )[1]
    B = images.shape[0]
    ctx_len = model.cfg.text_cfg.context_length

    def step(carry, i):
        seq, done = carry
        logits = apply_decode(seq[:, : ctx_len - 1], pooled_tokens)
        next_tok = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, 0, next_tok)
        seq = jax.lax.dynamic_update_slice(seq, next_tok[:, None], (0, i + 1))
        done = done | (next_tok == eot_token)
        return (seq, done), None

    seq0 = jnp.zeros((B, ctx_len), jnp.int32).at[:, 0].set(sot_token)
    (seq, _), _ = jax.lax.scan(
        # max_len counts the SOT (reference seq_len semantics)
        step, (seq0, jnp.zeros((B,), bool)), jnp.arange(min(max_len - 1, ctx_len - 1))
    )
    return seq
