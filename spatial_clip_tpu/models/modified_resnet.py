"""OpenAI modified ResNet vision tower (ref: src/open_clip/modified_resnet.py:
96-236 ``ModifiedResNet``, AttentionPool2d :59).

Differences from torchvision ResNet (faithful to the reference): a 3-conv
stem with an average pool instead of max pool, anti-aliased rect-2 blur
(avgpool) before every stride-2 conv, and a final QKV attention pool.

BatchNorm is implemented as *frozen* batch norm (running statistics are
parameters held fixed via stop_gradient): the spatial-CLIP use cases for the
ResNet tower are loading pretrained weights for eval/LiT-finetune. Training
BN statistics from scratch is out of scope (the reference project always
trains ViTs).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = jax.lax.stop_gradient(
            self.param("mean", nn.initializers.zeros, (dim,), jnp.float32)
        )
        var = jax.lax.stop_gradient(
            self.param("var", nn.initializers.ones, (dim,), jnp.float32)
        )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


def _avg_pool(x: jnp.ndarray, window: int, stride: Optional[int] = None) -> jnp.ndarray:
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


class Bottleneck(nn.Module):
    """ref: modified_resnet.py Bottleneck (expansion 4, avgpool downsample)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        expansion = 4
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k, k), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            padding="SAME", name=name,
        )
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)  # blur-pool before the 1x1
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(
            conv(self.planes * expansion, 1, "conv3")(out)
        )
        identity = x
        if self.downsample:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(
                nn.Conv(
                    self.planes * expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="downsample_conv",
                )(identity)
            )
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """ref: modified_resnet.py:59-93 — mean-token query attention pooling."""

    embed_dim: int
    heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(C ** -0.5),
            (H * W + 1, C), jnp.float32,
        )
        tokens = tokens + pos[None].astype(self.dtype)
        head_dim = self.embed_dim // self.heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj")(tokens)
        q = q.reshape(B, 1, self.heads, head_dim)
        k = k.reshape(B, -1, self.heads, head_dim)
        v = v.reshape(B, -1, self.heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * head_dim ** -0.5, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, self.embed_dim)
        return nn.Dense(
            self.output_dim, dtype=self.dtype, param_dtype=jnp.float32, name="c_proj"
        )(out)


class ModifiedResNet(nn.Module):
    """ref: modified_resnet.py:96-236."""

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)  # RN50
    width: int = 64
    image_size: int = 224
    heads: int = 32
    output_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = images.astype(self.dtype)
        w = self.width

        def stem_conv(f, stride, name):
            # torch pads (1,1) explicitly; SAME would pad (0,1) for stride 2
            # which shifts the grid and breaks checkpoint parity
            return nn.Conv(
                f, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )

        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(stem_conv(w // 2, 2, "conv1")(x)))
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(stem_conv(w // 2, 1, "conv2")(x)))
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn3")(stem_conv(w, 1, "conv3")(x)))
        x = _avg_pool(x, 2)

        in_planes = w
        for stage, blocks in enumerate(self.layers):
            planes = w * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0 and (stride > 1 or in_planes != planes * 4)),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            in_planes = planes * 4

        return AttentionPool2d(
            embed_dim=in_planes,
            heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x)
