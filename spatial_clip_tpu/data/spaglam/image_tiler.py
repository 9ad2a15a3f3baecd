"""Unified tile extraction (ref: src/spaglam_preproc/core/image_tiler.py:19-124).

``ImageHandler`` crops fixed-size, boundary-padded tiles centered on spot
coordinates from any of: an OpenSlide WSI (optional dependency), a PIL image,
a numpy array, or an AnnData carrying its image under
``uns['spatial'][lib]['images'][key]``.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Union

import numpy as np
from PIL import Image

log = logging.getLogger(__name__)

Image.MAX_IMAGE_PIXELS = None  # WSIs exceed PIL's default bomb limit


class ImageHandler:
    def __init__(self, source, tile_size: int = 224, fill_value: int = 255):
        self.tile_size = tile_size
        self.fill_value = fill_value
        self._slide = None
        self._array: Optional[np.ndarray] = None

        if source is None:
            self._array = None
        elif isinstance(source, np.ndarray):
            self._array = source
        elif isinstance(source, Image.Image):
            self._array = np.asarray(source.convert("RGB"))
        elif isinstance(source, (str, Path)):
            path = Path(source)
            if path.suffix.lower() in (".svs", ".tif", ".tiff", ".ndpi", ".mrxs"):
                try:
                    import openslide

                    self._slide = openslide.OpenSlide(str(path))
                except ImportError:
                    log.warning("openslide unavailable; loading %s via PIL", path)
                    self._array = np.asarray(Image.open(path).convert("RGB"))
            else:
                self._array = np.asarray(Image.open(path).convert("RGB"))
        elif hasattr(source, "uns"):  # AnnData(-Lite) with embedded image
            self._array = extract_spatial_image(source)
        else:
            raise TypeError(f"unsupported image source: {type(source)}")

    @property
    def dimensions(self):
        if self._slide is not None:
            return self._slide.dimensions  # (width, height)
        if self._array is not None:
            h, w = self._array.shape[:2]
            return (w, h)
        return (0, 0)

    def get_tile(self, x: float, y: float, size: Optional[int] = None) -> np.ndarray:
        """Boundary-padded tile of shape (size, size, 3) centered at (x, y);
        x is the image column, y the row (10x convention,
        ref: image_tiler.py:90-124)."""
        size = size or self.tile_size
        half = size // 2
        left, top = int(round(x)) - half, int(round(y)) - half

        if self._slide is not None:
            tile = np.asarray(
                self._slide.read_region((left, top), 0, (size, size)).convert("RGB")
            )
            return tile

        out = np.full((size, size, 3), self.fill_value, dtype=np.uint8)
        if self._array is None:
            return out
        H, W = self._array.shape[:2]
        src_y0, src_y1 = max(0, top), min(H, top + size)
        src_x0, src_x1 = max(0, left), min(W, left + size)
        if src_y1 > src_y0 and src_x1 > src_x0:
            dst_y0 = src_y0 - top
            dst_x0 = src_x0 - left
            patch = self._array[src_y0:src_y1, src_x0:src_x1]
            if patch.ndim == 2:
                patch = np.repeat(patch[:, :, None], 3, axis=2)
            out[
                dst_y0 : dst_y0 + (src_y1 - src_y0),
                dst_x0 : dst_x0 + (src_x1 - src_x0),
            ] = patch[:, :, :3]
        return out

    def close(self):
        if self._slide is not None:
            self._slide.close()


def extract_spatial_image(adata) -> Optional[np.ndarray]:
    """Pull the largest embedded image out of ``uns['spatial']``
    (ref: image_tiler.py AnnData branch)."""
    spatial = adata.uns.get("spatial")
    if not isinstance(spatial, dict):
        return None
    best = None
    for lib in spatial.values():
        if not isinstance(lib, dict):
            continue
        images = lib.get("images", {})
        if not isinstance(images, dict):
            continue
        for key in ("fullres", "hires", "lowres"):
            img = images.get(key)
            if img is not None:
                arr = np.asarray(img)
                if arr.dtype != np.uint8:
                    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                if best is None or arr.size > best.size:
                    best = arr
    return best
