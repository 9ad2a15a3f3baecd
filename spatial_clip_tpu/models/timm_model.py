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
    """Plain ViT trunk, returns a token grid (B, gh, gw, width) — or, with
    ``cls_token=True``, the full token sequence (B, 1+L, width) for 'token'
    pooling. Covers timm's ``vit_*_gap_*`` / ``vit_*_siglip_*`` families."""

    patch_size: int = 16
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    cls_token: bool = False
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
        L = gh * gw
        x = x.reshape(B, L, self.width)
        n_prefix = 0
        if self.cls_token:
            cls = self.param("cls", nn.initializers.normal(0.02),
                             (self.width,), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls[None, None], (B, 1, self.width)).astype(self.dtype), x],
                axis=1,
            )
            n_prefix = 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (L + n_prefix, self.width), jnp.float32,
        )
        x = x + pos[None].astype(self.dtype)
        x = Transformer(
            width=self.width, layers=self.layers, heads=self.heads,
            mlp_ratio=self.mlp_ratio, dtype=self.dtype, name="blocks",
        )(x)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        if self.cls_token:
            return x  # (B, 1+L, width)
        return x.reshape(B, gh, gw, self.width)


class EVATrunk(nn.Module):
    """EVA02-style ViT trunk: cls token, 2D rotary position embedding on q/k
    (patch tokens only) and SwiGLU MLP (ref: the reference ships EVA01/02
    configs through timm, timm_model_name='eva02_*', model_configs/EVA*.json).
    Returns the full token sequence (B, 1+L, width) for 'token' pooling."""

    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0 * 2 / 3  # SwiGLU convention: hidden = ratio*width
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.width, kernel_size=(p, p), strides=(p, p), dtype=self.dtype,
            param_dtype=jnp.float32, name="patch_embed",
        )(x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        L = gh * gw
        x = x.reshape(B, L, self.width)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (self.width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, self.width)).astype(self.dtype), x],
            axis=1,
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (L + 1, self.width), jnp.float32)
        x = x + pos[None].astype(self.dtype)

        hd = self.width // self.heads
        sin, cos = _rope_2d(hd, gh, gw)
        sin = sin.astype(self.dtype)
        cos = cos.astype(self.dtype)
        hidden = int(self.width * self.mlp_ratio)

        for i in range(self.layers):
            blk = f"blocks_{i}"
            h = LayerNorm(dtype=self.dtype, eps=1e-6, name=f"{blk}_ln1")(x)
            qkv = nn.Dense(3 * self.width, dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"{blk}_qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def rope(t):
                # rotary on patch tokens only; cls passes through
                heads_t = t[:, 1:].reshape(B, L, self.heads, hd)
                rot = heads_t * cos[None, :, None, :] + _rotate_half(heads_t) * sin[None, :, None, :]
                return jnp.concatenate(
                    [t[:, :1], rot.reshape(B, L, self.width)], axis=1
                )

            q, k = rope(q), rope(k)
            qh = q.reshape(B, L + 1, self.heads, hd)
            kh = k.reshape(B, L + 1, self.heads, hd)
            vh = v.reshape(B, L + 1, self.heads, hd)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qh * hd ** -0.5, kh).astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, L + 1, self.width)
            o = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{blk}_proj")(o)
            x = x + o
            h = LayerNorm(dtype=self.dtype, eps=1e-6, name=f"{blk}_ln2")(x)
            # SwiGLU: (silu(w1 x) * w2 x) w3
            g = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{blk}_w1")(h)
            u = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{blk}_w2")(h)
            h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{blk}_w3")(jax.nn.silu(g) * u)
            x = x + h
        return LayerNorm(dtype=self.dtype, eps=1e-6, name="norm")(x)


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck (ViTamin conv stages)."""

    dim: int
    expand: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = LayerNorm(dtype=self.dtype, eps=1e-6, name="norm")(x)
        h = nn.Conv(self.dim * self.expand, kernel_size=(1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.dim * self.expand, kernel_size=(3, 3), padding="SAME",
                    feature_group_count=self.dim * self.expand, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.dim, kernel_size=(1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="project")(h)
        return x + h


class ViTaminTrunk(nn.Module):
    """ViTamin hybrid trunk: conv stem -> 2 MBConv stages -> ViT stage
    (ref: ViTamin-*.json configs via timm_model_name='vitamin_*')."""

    conv_dims: Tuple[int, int] = (128, 256)
    conv_depths: Tuple[int, int] = (2, 4)
    vit_width: int = 768
    vit_layers: int = 14
    vit_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.conv_dims[0] // 2, kernel_size=(3, 3), strides=(2, 2),
                    padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv1")(x.astype(self.dtype))
        x = nn.gelu(x)
        x = nn.Conv(self.conv_dims[0], kernel_size=(3, 3), strides=(2, 2),
                    padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv2")(x)
        for stage, (dim, depth) in enumerate(zip(self.conv_dims, self.conv_depths)):
            if stage > 0:
                x = nn.Conv(dim, kernel_size=(2, 2), strides=(2, 2),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"ds_{stage}")(x)
            for b in range(depth):
                x = MBConvBlock(dim=dim, dtype=self.dtype,
                                name=f"stage{stage}_mbconv{b}")(x)
        # to ViT stage at stride 16
        x = nn.Conv(self.vit_width, kernel_size=(2, 2), strides=(2, 2),
                    dtype=self.dtype, param_dtype=jnp.float32, name="vit_embed")(x)
        B, gh, gw, _ = x.shape
        t = x.reshape(B, gh * gw, self.vit_width)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (gh * gw, self.vit_width), jnp.float32)
        t = t + pos[None].astype(self.dtype)
        t = Transformer(width=self.vit_width, layers=self.vit_layers,
                        heads=self.vit_heads, dtype=self.dtype, name="vit")(t)
        t = LayerNorm(dtype=self.dtype, eps=1e-6, name="norm")(t)
        return t.reshape(B, gh, gw, self.vit_width)


class RepMixerBlock(nn.Module):
    """FastViT token-mixing block (train-time form: depthwise 3x3 residual
    mixer + convolutional FFN)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = LayerNorm(dtype=self.dtype, eps=1e-6, name="mix_norm")(x)
        h = nn.Conv(self.dim, kernel_size=(3, 3), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=jnp.float32, name="mixer")(h)
        x = x + h
        h = LayerNorm(dtype=self.dtype, eps=1e-6, name="ffn_norm")(x)
        h = nn.Conv(self.dim * 3, kernel_size=(1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="ffn_fc")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.dim, kernel_size=(1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="ffn_proj")(h)
        return x + h


class FastViTTrunk(nn.Module):
    """FastViT/MCi trunk (MobileCLIP image encoders, timm 'fastvit_mci*'):
    conv stem, 3 RepMixer stages, final attention stage."""

    dims: Tuple[int, ...] = (76, 152, 304, 608)
    depths: Tuple[int, ...] = (2, 6, 10, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.dims[0], kernel_size=(3, 3), strides=(2, 2),
                    padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem1")(x.astype(self.dtype))
        x = nn.gelu(x)
        x = nn.Conv(self.dims[0], kernel_size=(3, 3), strides=(2, 2),
                    padding="SAME", feature_group_count=self.dims[0],
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem2")(x)
        for stage, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if stage > 0:
                x = nn.Conv(dim, kernel_size=(2, 2), strides=(2, 2),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"ds_{stage}")(x)
            if stage < 3:
                for b in range(depth):
                    x = RepMixerBlock(dim=dim, dtype=self.dtype,
                                      name=f"stage{stage}_block{b}")(x)
            else:
                B, gh, gw, C = x.shape
                t = x.reshape(B, gh * gw, C)
                t = Transformer(width=C, heads=max(1, C // 64), layers=depth,
                                dtype=self.dtype, name="attn_stage")(t)
                x = t.reshape(B, gh, gw, C)
        return LayerNorm(dtype=self.dtype, eps=1e-6, name="norm")(x)


class SwinBlock(nn.Module):
    """Windowed MSA block with optional shifted windows and relative position
    bias (Swin transformer; timm 'swin_base_patch4_window7_224')."""

    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        w = self.window
        h = LayerNorm(dtype=self.dtype, eps=1e-5, name="norm1")(x)
        if self.shift:
            h = jnp.roll(h, shift=(-self.shift, -self.shift), axis=(1, 2))
        nh, nw = H // w, W // w
        win = h.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(B * nh * nw, w * w, C)
        hd = C // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(win)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        nW = win.shape[0]
        qh = q.reshape(nW, w * w, self.heads, hd)
        kh = k.reshape(nW, w * w, self.heads, hd)
        vh = v.reshape(nW, w * w, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * hd ** -0.5, kh).astype(jnp.float32)
        # relative position bias table ((2w-1)^2, heads)
        table = self.param(
            "rel_bias", nn.initializers.normal(0.02),
            ((2 * w - 1) ** 2, self.heads), jnp.float32,
        )
        coords = jnp.stack(jnp.meshgrid(jnp.arange(w), jnp.arange(w),
                                        indexing="ij"), -1).reshape(-1, 2)
        rel = coords[:, None] - coords[None, :] + (w - 1)
        idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
        attn = attn + table[idx].transpose(2, 0, 1)[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(nW, w * w, C)
        o = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(o)
        o = o.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        if self.shift:
            o = jnp.roll(o, shift=(self.shift, self.shift), axis=(1, 2))
        x = x + o
        h = LayerNorm(dtype=self.dtype, eps=1e-5, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc")(h)
        h = nn.gelu(h)
        h = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_proj")(h)
        return x + h


class SwinTrunk(nn.Module):
    """Hierarchical Swin trunk (4x patch embed, patch-merging downsamples)."""

    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    heads: Tuple[int, ...] = (4, 8, 16, 32)
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.dims[0], kernel_size=(4, 4), strides=(4, 4),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype, eps=1e-5, name="embed_norm")(x)
        for stage, (dim, depth, heads) in enumerate(
            zip(self.dims, self.depths, self.heads)
        ):
            if stage > 0:
                # patch merging: 2x2 neighborhood concat + linear reduce
                B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
                x = LayerNorm(dtype=self.dtype, eps=1e-5,
                              name=f"merge_norm_{stage}")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"merge_{stage}")(x)
            for b in range(depth):
                x = SwinBlock(
                    dim=dim, heads=heads, window=self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    dtype=self.dtype, name=f"stage{stage}_block{b}",
                )(x)
        return LayerNorm(dtype=self.dtype, eps=1e-5, name="norm")(x)


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


def _eva(width, layers, heads, patch):
    return TrunkSpec(
        build=lambda dtype, name=None: EVATrunk(
            patch_size=patch, width=width, layers=layers, heads=heads,
            dtype=dtype, name=name,
        ),
        reduction=patch,
    )


def _vitamin(conv_dims, conv_depths, vit_width, vit_layers, vit_heads):
    return TrunkSpec(
        build=lambda dtype, name=None: ViTaminTrunk(
            conv_dims=conv_dims, conv_depths=conv_depths, vit_width=vit_width,
            vit_layers=vit_layers, vit_heads=vit_heads, dtype=dtype, name=name,
        ),
        reduction=16,
    )


def _fastvit(dims, depths):
    return TrunkSpec(
        build=lambda dtype, name=None: FastViTTrunk(
            dims=dims, depths=depths, dtype=dtype, name=name
        ),
        reduction=32,
    )


TRUNKS.update({
    # EVA family (model_configs/EVA01*/EVA02*.json)
    "eva02_base_patch16_clip_224": _eva(768, 12, 12, 16),
    "eva02_large_patch14_clip_224": _eva(1024, 24, 16, 14),
    "eva02_large_patch14_clip_336": _eva(1024, 24, 16, 14),
    "eva02_enormous_patch14_clip_224": _eva(1792, 64, 16, 14),
    "eva_giant_patch14_224": _eva(1408, 40, 16, 14),
    "eva_pico_patch16_test": _eva(64, 2, 2, 16),
    # PE-Core: plain ViT trunks + MAP pooling (model_configs/PE-Core-*.json)
    "vit_pe_core_tiny_patch16_384": _siglip_vit(192, 12, 3, 16),
    "vit_pe_core_small_patch16_384": _siglip_vit(384, 12, 6, 16),
    "vit_pe_core_base_patch16_224": _siglip_vit(768, 12, 12, 16),
    "vit_pe_core_large_patch14_336": _siglip_vit(1024, 24, 16, 14),
    "vit_pe_core_gigantic_patch14_448": _siglip_vit(1536, 50, 16, 14),
    # ViTamin hybrids (model_configs/ViTamin-*.json)
    "vitamin_small_224": _vitamin((64, 128), (2, 4), 384, 14, 6),
    "vitamin_base_224": _vitamin((128, 256), (2, 4), 768, 14, 12),
    "vitamin_large_224": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large_256": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large_336": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large_384": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large2_224": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large2_256": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large2_336": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large2_384": _vitamin((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_xlarge_256": _vitamin((192, 384), (2, 4), 1152, 32, 16),
    "vitamin_xlarge_336": _vitamin((192, 384), (2, 4), 1152, 32, 16),
    "vitamin_xlarge_384": _vitamin((192, 384), (2, 4), 1152, 32, 16),
    "vitamin_pico_test": _vitamin((16, 32), (1, 1), 64, 2, 2),
    # MobileCLIP image encoders (model_configs/MobileCLIP-*.json)
    "fastvit_mci1": _fastvit((64, 128, 256, 512), (2, 6, 10, 2)),
    "fastvit_mci2": _fastvit((80, 160, 320, 640), (2, 6, 10, 2)),
    "fastvit_pico_test": _fastvit((16, 32, 64, 128), (1, 1, 1, 1)),
    # MobileCLIP-B: ViT-B/16 (MCi stem approximated by the patch conv) with a
    # class token for the config's 'token' pooling
    "vit_base_mci_224": TrunkSpec(
        build=lambda dtype, name=None: ViTTrunk(
            patch_size=16, width=768, layers=12, heads=12, cls_token=True,
            dtype=dtype, name=name,
        ),
        reduction=16,
    ),
    # relative-position ViT approximated with a learned-pos cls ViT
    "vit_relpos_medium_patch16_cls_224": TrunkSpec(
        build=lambda dtype, name=None: ViTTrunk(
            patch_size=16, width=512, layers=12, heads=8, cls_token=True,
            dtype=dtype, name=name,
        ),
        reduction=16,
    ),
    "swin_base_patch4_window7_224": TrunkSpec(
        build=lambda dtype, name=None: SwinTrunk(dtype=dtype, name=name),
        reduction=32,
    ),
    "swin_pico_test": TrunkSpec(
        build=lambda dtype, name=None: SwinTrunk(
            dims=(16, 32, 64, 128), depths=(1, 1, 1, 1), heads=(1, 2, 4, 8),
            window=2, dtype=dtype, name=name,
        ),
        reduction=32,
    ),
})


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
        has_cls = feat.ndim == 3 and int(feat.shape[1] ** 0.5) ** 2 != feat.shape[1]
        if self.pool == "token":
            # class-token pooling (timm global_pool='token'; EVA/MobileCLIP)
            x = feat[:, 0] if feat.ndim == 3 else feat.mean(axis=(1, 2))
        else:
            if feat.ndim == 3:  # token sequence -> (B, gh, gw, C)
                if has_cls:
                    feat = feat[:, 1:]
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
        elif self.proj in (None, ""):
            # falsy-but-not-'none' proj: the reference routes this through
            # the trunk's classifier head projecting to embed_dim
            # (ref: timm_model.py:55-67 — num_classes=embed_dim)
            if x.shape[-1] != self.embed_dim:
                x = nn.Dense(
                    self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                    name="head_fc",
                )(x)
        # proj == 'none': pass-through (dims must already match embed_dim
        # unless an attention pool projected them)
        return x
