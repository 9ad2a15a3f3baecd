"""timm-equivalent vision tower family, TPU-native (flax).

The reference wraps arbitrary timm backbones as CLIP vision towers with
configurable pooling/projection heads (ref: src/open_clip/timm_model.py:23-215
``TimmModel``; config keys ``timm_model_name``/``timm_pool``/``timm_proj``/
``timm_proj_bias``/``timm_drop``/``timm_drop_path`` consumed in
src/open_clip/model.py:144-160). timm itself is torch and unavailable here,
so this module provides the same adapter surface over TPU-native trunks:

- a trunk REGISTRY keyed by timm model names (convnext_* family, vit_*gap*),
  each an NHWC flax module returning either pooled features or a spatial
  feature map;
- the head options of the reference adapter: pool ``avg``/``''``(trunk
  default)/``abs_attn``/``rot_attn``, proj ``linear``/``mlp``/``none`` with
  ``proj_bias`` and dropout.

ConvNeXt is implemented depthwise-conv-native (NHWC, feature_group_count),
which XLA maps well to the TPU convolution unit; LayerNorms keep fp32 stats.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spatial_clip_tpu.models.transformer import LayerNorm, Transformer

Dtype = Any


# ---------------------------------------------------------------------------
# trunks
# ---------------------------------------------------------------------------


class ConvNeXtBlock(nn.Module):
    dim: int
    ls_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.dim, kernel_size=(7, 7), padding="SAME",
            feature_group_count=self.dim, dtype=self.dtype,
            param_dtype=jnp.float32, name="dwconv",
        )(x)
        h = LayerNorm(dtype=self.dtype, eps=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.ls_init), (self.dim,),
            jnp.float32,
        )
        return x + h * gamma.astype(self.dtype)


class ConvNeXtTrunk(nn.Module):
    """ConvNeXt feature trunk (NHWC). Returns (B, H/32, W/32, dims[-1])."""

    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    dtype: Dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return self.dims[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.dims[0], kernel_size=(4, 4), strides=(4, 4),
            dtype=self.dtype, param_dtype=jnp.float32, name="stem_conv",
        )(x.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype, eps=1e-6, name="stem_norm")(x)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = LayerNorm(dtype=self.dtype, eps=1e-6, name=f"ds_norm_{stage}")(x)
                x = nn.Conv(
                    dim, kernel_size=(2, 2), strides=(2, 2), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"ds_conv_{stage}",
                )(x)
            for blk in range(depth):
                x = ConvNeXtBlock(
                    dim=dim, dtype=self.dtype, name=f"stage{stage}_block{blk}"
                )(x)
        return x


class ViTTrunk(nn.Module):
    """Plain ViT trunk (gap-style: no class token), returns token grid
    (B, gh*gw, width). Covers timm's ``vit_*_gap_*`` naming family."""

    patch_size: int = 16
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return self.width

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.width, kernel_size=(p, p), strides=(p, p), dtype=self.dtype,
            param_dtype=jnp.float32, name="patch_embed",
        )(x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.width)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (gh * gw, self.width),
            jnp.float32,
        )
        x = x + pos[None].astype(self.dtype)
        x = Transformer(
            width=self.width, layers=self.layers, heads=self.heads,
            mlp_ratio=self.mlp_ratio, dtype=self.dtype, name="blocks",
        )(x)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x.reshape(B, gh, gw, self.width)


@dataclass(frozen=True)
class TrunkSpec:
    build: Callable[..., nn.Module]  # (dtype, name) -> module
    reduction: int  # spatial reduction factor (for feat_size calc)


def _convnext(depths, dims):
    return TrunkSpec(
        build=lambda dtype, name=None: ConvNeXtTrunk(
            depths=depths, dims=dims, dtype=dtype, name=name
        ),
        reduction=32,
    )


TRUNKS: Dict[str, TrunkSpec] = {
    "convnext_tiny": _convnext((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": _convnext((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": _convnext((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": _convnext((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": _convnext((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": _convnext((3, 4, 30, 3), (384, 768, 1536, 3072)),
    "vit_medium_patch16_gap_256": TrunkSpec(
        build=lambda dtype, name=None: ViTTrunk(
            patch_size=16, width=512, layers=12, heads=8, dtype=dtype, name=name
        ),
        reduction=16,
    ),
    "vit_base_patch16_gap_224": TrunkSpec(
        build=lambda dtype, name=None: ViTTrunk(
            patch_size=16, width=768, layers=12, heads=12, dtype=dtype, name=name
        ),
        reduction=16,
    ),
    # small trunk for tests
    "convnext_pico": _convnext((2, 2, 4, 2), (32, 64, 128, 256)),
}


def _siglip_vit(width, layers, heads, patch, mlp_ratio=4.0):
    # SigLIP ViT trunks: gap-style ViT (no cls token), MAP pooling is
    # applied by the adapter head (timm_pool='map')
    return TrunkSpec(
        build=lambda dtype, name=None: ViTTrunk(
            patch_size=patch, width=width, layers=layers, heads=heads,
            mlp_ratio=mlp_ratio, dtype=dtype, name=name,
        ),
        reduction=patch,
    )


for _p in (16, 32):
    for _sz in (224, 256, 384, 512):
        TRUNKS[f"vit_base_patch{_p}_siglip_{_sz}"] = _siglip_vit(768, 12, 12, _p)
for _sz in (256, 384, 512):
    TRUNKS[f"vit_large_patch16_siglip_{_sz}"] = _siglip_vit(1024, 24, 16, 16)
for _p, _sz in ((14, 224), (14, 378), (14, 384), (16, 256), (16, 384), (16, 512)):
    TRUNKS[f"vit_so400m_patch{_p}_siglip_{_sz}"] = _siglip_vit(
        1152, 27, 16, _p, mlp_ratio=3.7362
    )
for _sz in (256, 384):
    TRUNKS[f"vit_giantopt_patch16_siglip_{_sz}"] = _siglip_vit(1536, 40, 16, 16)
# tiny siglip-style trunk for tests
TRUNKS["vit_pico_patch16_siglip_test"] = _siglip_vit(64, 2, 2, 16)


def list_timm_trunks():
    return sorted(TRUNKS)


# ---------------------------------------------------------------------------
# pooling heads (ref: timm AttentionPool2d / RotAttentionPool2d semantics)
# ---------------------------------------------------------------------------


def _rope_2d(width: int, gh: int, gw: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D rotary embedding tables (sin, cos) of shape (gh*gw, width)."""
    assert width % 4 == 0
    quarter = width // 4
    freqs = 1.0 / (10000 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))

    def axis(n):
        return jnp.einsum("p,d->pd", jnp.arange(n, dtype=jnp.float32), freqs)

    ay = jnp.repeat(axis(gh)[:, None, :], gw, axis=1)  # (gh, gw, q)
    ax = jnp.repeat(axis(gw)[None, :, :], gh, axis=0)
    ang = jnp.concatenate([ay, ax], axis=-1).reshape(gh * gw, width // 2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.sin(ang), jnp.cos(ang)


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


class AttentionPool2dHead(nn.Module):
    """Single-query attention pooling over a spatial feature map.

    ``rotary=False`` ~ timm AbsAttentionPool2d (learned 2D pos-embed);
    ``rotary=True`` ~ timm RotAttentionPool2d (2D rotary on q/k).
    Query = mean token; output projected to ``out_features``.
    """

    out_features: int
    heads: int = 8
    rotary: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        B, gh, gw, C = feat.shape
        L = gh * gw
        x = feat.reshape(B, L, C)
        if not self.rotary:
            pos = self.param(
                "pos_embed", nn.initializers.normal(C ** -0.5), (L, C),
                jnp.float32,
            )
            x = x + pos[None].astype(self.dtype)
        q_tok = x.mean(axis=1, keepdims=True)  # (B, 1, C)
        head_dim = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="q")(q_tok)
        k = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="k")(x)
        v = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="v")(x)
        if self.rotary:
            sin, cos = _rope_2d(head_dim, gh, gw)
            sin = jnp.tile(sin, (1, self.heads)).astype(self.dtype)
            cos = jnp.tile(cos, (1, self.heads)).astype(self.dtype)
            k = k * cos[None] + _rotate_half(k.reshape(B, L, self.heads, head_dim)).reshape(B, L, C) * sin[None]
        qh = q.reshape(B, 1, self.heads, head_dim)
        kh = k.reshape(B, L, self.heads, head_dim)
        vh = v.reshape(B, L, self.heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * head_dim ** -0.5, kh).astype(
            jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, C)
        return nn.Dense(
            self.out_features, dtype=self.dtype, param_dtype=jnp.float32,
            name="proj",
        )(out)


class MAPHead(nn.Module):
    """big_vision MAP head (SigLIP pooling): learned probe token attends over
    the feature map, then an MLP residual. Param layout mirrors big_vision so
    SigLIP .npz checkpoints convert 1:1 (ref: src/open_clip/convert.py:96-113,
    MAPHead_0/{probe, MultiHeadDotProductAttention_0, LayerNorm_0,
    MlpBlock_0})."""

    heads: Optional[int] = None  # default: C // 64 (big_vision convention)
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        if feat.ndim == 4:
            B, gh, gw, C = feat.shape
            x = feat.reshape(B, gh * gw, C)
        else:
            B, L, C = feat.shape
            x = feat
        L = x.shape[1]
        heads = self.heads or max(1, C // 64)
        probe = self.param("probe", nn.initializers.normal(0.02), (1, C),
                           jnp.float32)
        q_tok = jnp.broadcast_to(probe[None], (B, 1, C)).astype(self.dtype)
        head_dim = C // heads
        q = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="q")(q_tok)
        k = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="k")(x)
        v = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="v")(x)
        qh = q.reshape(B, 1, heads, head_dim)
        kh = k.reshape(B, L, heads, head_dim)
        vh = v.reshape(B, L, heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * head_dim ** -0.5, kh).astype(
            jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, 1, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="out")(out)
        y = LayerNorm(eps=self.norm_eps, dtype=self.dtype, name="ln")(out)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc")(y)
        h = nn.gelu(h)
        h = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_proj")(h)
        return (out + h)[:, 0]


# ---------------------------------------------------------------------------
# the adapter
# ---------------------------------------------------------------------------


class TimmStyleTower(nn.Module):
    """TPU-native analogue of the reference TimmModel adapter
    (ref: src/open_clip/timm_model.py:23-145)."""

    model_name: str
    embed_dim: int
    image_size: int = 224
    pool: str = "avg"  # avg | '' (trunk default=avg) | abs_attn | rot_attn
    proj: str = "linear"  # linear | mlp | none
    proj_bias: bool = False
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        if self.model_name not in TRUNKS:
            raise KeyError(
                f"unknown timm-style trunk '{self.model_name}'; available: "
                f"{list_timm_trunks()}"
            )
        spec = TRUNKS[self.model_name]
        trunk = spec.build(self.dtype, name="trunk")
        feat = trunk(images, deterministic=deterministic)
        if feat.ndim == 3:  # token grid from ViT trunks -> (B, gh, gw, C)
            B, L, C = feat.shape
            g = int(L ** 0.5)
            feat = feat.reshape(B, g, g, C)

        if self.pool == "map":
            x = MAPHead(dtype=self.dtype, name="attn_pool")(feat)
        elif self.pool in ("abs_attn", "rot_attn"):
            x = AttentionPool2dHead(
                out_features=self.embed_dim,
                rotary=self.pool == "rot_attn",
                dtype=self.dtype,
                name="attn_pool",
            )(feat)
        else:  # 'avg' or trunk-default
            x = feat.mean(axis=(1, 2))
            x = LayerNorm(dtype=self.dtype, eps=1e-6, name="head_norm")(x)

        if self.drop > 0 and not deterministic:
            x = nn.Dropout(rate=self.drop)(x, deterministic=False)
        if self.proj == "linear":
            x = nn.Dense(
                self.embed_dim, use_bias=self.proj_bias, dtype=self.dtype,
                param_dtype=jnp.float32, name="head_proj",
            )(x)
        elif self.proj == "mlp":
            x = nn.Dense(
                2 * self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="head_mlp_fc",
            )(x)
            x = nn.gelu(x)
            x = nn.Dense(
                self.embed_dim, use_bias=self.proj_bias, dtype=self.dtype,
                param_dtype=jnp.float32, name="head_mlp_proj",
            )(x)
        # proj == 'none': pass-through (dims must already match embed_dim
        # unless an attention pool projected them)
        return x
