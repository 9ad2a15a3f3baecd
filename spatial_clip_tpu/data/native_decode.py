"""Native PNG/JPEG decode (native/imagedec.cpp) with a PIL fallback.

Image decode is the measured host bottleneck on both hot host paths —
the tar-shard training loader (tiles/sec/core) and the serving image
endpoint (reports/bench_serve_img.json: decode-bound at 188.7 tiles/sec on
a 1-core host). ``decode_rgb`` returns an (H, W, 3) uint8 array straight
from libpng/libjpeg with no PIL mode machinery; callers keep their PIL
path for formats/features the native path declines (returns None).
"""
from __future__ import annotations

import ctypes
import logging
from typing import Optional

import numpy as np

from spatial_clip_tpu.data.datasets._native import get_lib

log = logging.getLogger(__name__)

_configured = False
_ok = False


def _setup() -> bool:
    """Bind the decode symbols once; False when the library is absent or
    predates imagedec.cpp (symbols missing)."""
    global _configured, _ok
    if _configured:
        return _ok
    _configured = True
    lib = get_lib()
    if lib is None:
        return False
    try:
        lib.sc_image_info.restype = ctypes.c_int
        lib.sc_image_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.sc_decode_rgb.restype = ctypes.c_int
        lib.sc_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        _ok = True
    except AttributeError:
        log.debug("libspatialclip_native.so predates imagedec; PIL fallback")
        _ok = False
    return _ok


def decode_rgb(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG/JPEG bytes to an (H, W, 3) uint8 array, or None when the
    native path is unavailable / declines the payload (caller uses PIL)."""
    if not _setup():
        return None
    lib = get_lib()
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.sc_image_info(data, len(data), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.sc_decode_rgb(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes)
    if rc != 0:
        return None
    return out
