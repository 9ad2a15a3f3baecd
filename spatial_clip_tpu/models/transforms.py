"""Image preprocessing, split TPU-first into a host stage and a device stage.

Reference pipeline (ref: src/open_clip/transform.py:19-247): torchvision
RandomResizedCrop / Resize+CenterCrop + Normalize executed per-item on CPU.

TPU-native split:
- **host stage** (``image_transform``): decode + geometric crop/resize to the
  model's static input size, returning HWC uint8 — cheap, per-worker, keeps
  host->device transfers at 1 byte/pixel.
- **device stage** (``normalize_batch`` / ``augment_batch``): uint8 -> bf16
  scale+normalize and random flips, jitted and fused by XLA into the first
  conv's input pipeline (north-star config 2: fused on-device
  resize/normalize/augment).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from spatial_clip_tpu.models.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


@dataclass
class PreprocessCfg:
    """Ref: transform.py:19-55."""

    size: Union[int, Tuple[int, int]] = 224
    mode: str = "RGB"
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN
    std: Tuple[float, ...] = OPENAI_DATASET_STD
    interpolation: str = "bicubic"
    resize_mode: str = "shortest"
    fill_color: int = 0

    @property
    def size_tuple(self) -> Tuple[int, int]:
        s = self.size
        return (s, s) if isinstance(s, int) else tuple(s)


@dataclass
class AugmentationCfg:
    """Train-time augmentation knobs (ref: transform.py:58-74)."""

    scale: Tuple[float, float] = (0.9, 1.0)
    ratio: Tuple[float, float] = (0.75, 1.3333333333333333)
    color_jitter: Optional[float] = None
    gray_scale_prob: Optional[float] = None
    horizontal_flip_prob: float = 0.0
    use_device_augment: bool = True

    @classmethod
    def from_any(cls, cfg) -> "AugmentationCfg":
        if cfg is None:
            return cls()
        if isinstance(cfg, cls):
            return cfg
        if isinstance(cfg, dict):
            d = {k: v for k, v in cfg.items() if k in {f.name for f in dataclasses.fields(cls)}}
            for key in ("scale", "ratio"):
                if key in d and d[key] is not None:
                    d[key] = tuple(d[key])
            return cls(**d)
        raise TypeError(f"Cannot build AugmentationCfg from {type(cfg)}")


_PIL_INTERP = {
    "bicubic": Image.BICUBIC,
    "bilinear": Image.BILINEAR,
    "nearest": Image.NEAREST,
    "random": Image.BICUBIC,
}


def _center_crop(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    w, h = img.size
    th, tw = size
    left = max(0, (w - tw) // 2)
    top = max(0, (h - th) // 2)
    return img.crop((left, top, left + tw, top + th))


def _resize_shortest(img: Image.Image, size: Tuple[int, int], interp) -> Image.Image:
    w, h = img.size
    th, tw = size
    scale = max(th / h, tw / w)
    return img.resize((max(tw, round(w * scale)), max(th, round(h * scale))), interp)


def _resize_keep_ratio(
    img: Image.Image, size: Tuple[int, int], interp, longest: float = 0.0
) -> Image.Image:
    """Aspect-preserving resize interpolating between "cover" and "fit".

    ``longest=0`` scales so the image covers the target (ratio driven by the
    smaller per-axis ratio); ``longest=1`` scales so it fits within the
    target (ratio driven by the larger per-axis ratio). Matches the
    reference's ResizeKeepRatio semantics (ref: transform.py:77-93).
    """
    w, h = img.size
    th, tw = size
    ratio_h, ratio_w = h / th, w / tw
    ratio = max(ratio_h, ratio_w) * longest + min(ratio_h, ratio_w) * (1.0 - longest)
    return img.resize((round(w / ratio), round(h / ratio)), interp)


def _center_crop_or_pad(
    img: Image.Image, size: Tuple[int, int], fill: int = 0
) -> Image.Image:
    """Center-crop to ``size``, padding with ``fill`` where the image is
    smaller than the target (ref: transform.py:95-133)."""
    th, tw = size
    w, h = img.size
    if tw > w or th > h:
        pad_left = (tw - w) // 2 if tw > w else 0
        pad_top = (th - h) // 2 if th > h else 0
        nw, nh = max(tw, w), max(th, h)
        canvas = Image.new(img.mode, (nw, nh), tuple([fill] * len(img.getbands())))
        canvas.paste(img, (pad_left, pad_top))
        img = canvas
        w, h = img.size
        if w == tw and h == th:
            return img
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return img.crop((left, top, left + tw, top + th))


class HostImageTransform:
    """PIL -> HWC uint8 at the model input size.

    Train mode performs RandomResizedCrop sampling equivalent to
    torchvision's (log-uniform aspect ratio, uniform area scale); val mode is
    resize-shortest + center-crop (ref: transform.py:135-233).
    """

    # loaders may hand this transform a decoded (H, W, 3) uint8 ndarray
    # instead of a PIL Image (native-decode fast path); user-supplied
    # preprocess callables without this attribute always receive PIL Images
    accepts_ndarray = True

    @property
    def ndarray_fast_size(self):
        """(H, W) for which an RGB8 ndarray input is returned untouched, or
        None. Loaders use this to gate the native decoder: measured A/B
        (docs/experiments.md round-5) shows native decode only wins when it
        REPLACES the PIL trip entirely; decoding natively and then wrapping
        in Image.fromarray for a train-mode crop is net-neutral (-3%)."""
        if self.is_train or self.cfg.mode != "RGB":
            return None
        return self.cfg.size_tuple

    def __init__(
        self,
        cfg: PreprocessCfg,
        is_train: bool = False,
        aug: Optional[AugmentationCfg] = None,
        seed: Optional[int] = None,
    ):
        self.cfg = cfg
        self.is_train = is_train
        self.aug = AugmentationCfg.from_any(aug)
        self.rng = np.random.default_rng(seed)
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC)

    def _random_resized_crop(self, img: Image.Image) -> Image.Image:
        th, tw = self.cfg.size_tuple
        w, h = img.size
        area = w * h
        lo, hi = self.aug.scale
        rlo, rhi = self.aug.ratio
        for _ in range(10):
            target_area = area * self.rng.uniform(lo, hi)
            aspect = np.exp(self.rng.uniform(np.log(rlo), np.log(rhi)))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = int(self.rng.integers(0, w - cw + 1))
                top = int(self.rng.integers(0, h - ch + 1))
                return img.resize((tw, th), self.interp, box=(left, top, left + cw, top + ch))
        # fallback: center crop
        img = _resize_shortest(img, (th, tw), self.interp)
        return _center_crop(img, (th, tw))

    def __call__(self, img) -> np.ndarray:
        if isinstance(img, np.ndarray):
            # fast path for the native decoder (data/native_decode.py):
            # an RGB8 array already at the target size needs no PIL trip
            # (tile pipelines write tiles at the model size)
            th_, tw_ = self.cfg.size_tuple
            if (
                not self.is_train
                and self.cfg.mode == "RGB"
                and img.dtype == np.uint8
                and img.shape == (th_, tw_, 3)
            ):
                return img
            img = Image.fromarray(img)
        if img.mode != self.cfg.mode:
            img = img.convert(self.cfg.mode)
        th, tw = self.cfg.size_tuple
        if self.is_train:
            img = self._random_resized_crop(img)
        elif img.size != (tw, th):
            mode = self.cfg.resize_mode
            if mode == "squash":
                # distorting exact resize (ref: transform.py:216-219;
                # SigLIP tags pin this, pretrained.py:61)
                img = img.resize((tw, th), self.interp)
            elif mode == "longest":
                # fit-within + center pad with fill_color
                # (ref: transform.py:214-215)
                img = _resize_keep_ratio(img, (th, tw), self.interp, longest=1.0)
                img = _center_crop_or_pad(img, (th, tw), fill=self.cfg.fill_color)
            else:
                if mode != "shortest":
                    raise ValueError(f"unknown resize_mode: {mode!r}")
                img = _resize_shortest(img, (th, tw), self.interp)
                img = _center_crop(img, (th, tw))
        return np.asarray(img, dtype=np.uint8)


def normalize_batch(
    images_u8: jnp.ndarray,
    mean: Sequence[float] = OPENAI_DATASET_MEAN,
    std: Sequence[float] = OPENAI_DATASET_STD,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """uint8 (B,H,W,3) -> normalized float (B,H,W,3). Jit-friendly; XLA fuses
    this into the conv's input when jitted with the model forward."""
    mean_arr = jnp.asarray(mean, dtype=jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(std, dtype=jnp.float32) * 255.0)
    x = images_u8.astype(jnp.float32)
    return ((x - mean_arr) * inv_std).astype(dtype)


def augment_batch(
    rng: jax.Array,
    images_u8: jnp.ndarray,
    horizontal_flip_prob: float = 0.5,
    color_jitter: Optional[float] = None,
) -> jnp.ndarray:
    """On-device batched augmentation: random horizontal flip + brightness/
    contrast jitter. Static shapes; one fused elementwise pass on the VPU."""
    k_flip, k_b, k_c = jax.random.split(rng, 3)
    B = images_u8.shape[0]
    x = images_u8.astype(jnp.float32)
    if horizontal_flip_prob > 0:
        flip = jax.random.bernoulli(k_flip, horizontal_flip_prob, (B, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    if color_jitter:
        b = 1.0 + jax.random.uniform(k_b, (B, 1, 1, 1), minval=-color_jitter, maxval=color_jitter)
        c = 1.0 + jax.random.uniform(k_c, (B, 1, 1, 1), minval=-color_jitter, maxval=color_jitter)
        mean_px = x.mean(axis=(1, 2, 3), keepdims=True)
        x = (x - mean_px) * c + mean_px * b
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def augment_normalize_batch(
    rng: jax.Array,
    images_u8: jnp.ndarray,
    mean: Sequence[float] = OPENAI_DATASET_MEAN,
    std: Sequence[float] = OPENAI_DATASET_STD,
    dtype: Any = jnp.float32,
    horizontal_flip_prob: float = 0.5,
    color_jitter: Optional[float] = None,
) -> jnp.ndarray:
    """Fused augment + normalize: one affine elementwise pass over the batch.

    Brightness/contrast jitter and mean/std normalization are all per-pixel
    affine maps, so they compose into a single scale+shift; the horizontal
    flip folds into the same pass as a select on the reversed view. This
    avoids ``augment_batch``'s uint8 round-trip (several extra HBM passes on
    a (B,224,224,3) batch).
    """
    k_flip, k_b, k_c = jax.random.split(rng, 3)
    B = images_u8.shape[0]
    if horizontal_flip_prob > 0 and images_u8.dtype == jnp.uint8:
        # flip/select on the uint8 view (38 MB for B=256@224) — doing it
        # after the f32 cast walks 4x the bytes (profiled 'rev' family)
        flip = jax.random.bernoulli(k_flip, horizontal_flip_prob, (B, 1, 1, 1))
        images_u8 = jnp.where(flip, images_u8[:, :, ::-1, :], images_u8)
        x = images_u8.astype(jnp.float32)
    else:
        x = images_u8.astype(jnp.float32)
        if horizontal_flip_prob > 0:
            flip = jax.random.bernoulli(
                k_flip, horizontal_flip_prob, (B, 1, 1, 1)
            )
            x = jnp.where(flip, x[:, :, ::-1, :], x)
    mean_arr = jnp.asarray(mean, dtype=jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(std, dtype=jnp.float32) * 255.0)
    if color_jitter:
        b = 1.0 + jax.random.uniform(k_b, (B, 1, 1, 1), minval=-color_jitter, maxval=color_jitter)
        c = 1.0 + jax.random.uniform(k_c, (B, 1, 1, 1), minval=-color_jitter, maxval=color_jitter)
        mean_px = x.mean(axis=(1, 2, 3), keepdims=True)
        # ((x - mean_px)*c + mean_px*b - mean) * inv_std == x*(c*inv_std) + ...
        shift = mean_px * (b - c)
        x = ((x * c + shift) - mean_arr) * inv_std
    else:
        x = (x - mean_arr) * inv_std
    return x.astype(dtype)


def image_transform(
    image_size: Union[int, Tuple[int, int]] = 224,
    is_train: bool = False,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
    interpolation: str = "bicubic",
    resize_mode: str = "shortest",
    fill_color: int = 0,
    aug_cfg: Optional[Union[dict, AugmentationCfg]] = None,
    seed: Optional[int] = None,
) -> HostImageTransform:
    """Factory with the reference's signature shape (ref: transform.py:135)."""
    cfg = PreprocessCfg(size=image_size, mean=tuple(mean), std=tuple(std),
                        interpolation=interpolation, resize_mode=resize_mode,
                        fill_color=fill_color)
    return HostImageTransform(cfg, is_train=is_train, aug=aug_cfg, seed=seed)


def image_transform_v2(
    cfg: PreprocessCfg,
    is_train: bool = False,
    aug_cfg: Optional[Union[dict, AugmentationCfg]] = None,
    seed: Optional[int] = None,
) -> HostImageTransform:
    """Build a transform directly from a PreprocessCfg (ref: transform.py:234)."""
    return HostImageTransform(cfg, is_train=is_train, aug=aug_cfg, seed=seed)
