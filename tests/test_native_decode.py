"""Native libpng/libjpeg decode (native/imagedec.cpp via data/native_decode)
vs PIL — exact parity, loader fast path."""
import io

import numpy as np
import pytest
from PIL import Image

from spatial_clip_tpu.data.native_decode import decode_rgb


def _encoded(arr, fmt):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format=fmt)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tile(rng):
    return rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["PNG", "JPEG"])
def test_native_decode_matches_pil_exactly(tile, fmt):
    data = _encoded(tile, fmt)
    native = decode_rgb(data)
    if native is None:
        pytest.skip("native decoder not built")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert native.shape == (96, 64, 3) and native.dtype == np.uint8
    np.testing.assert_array_equal(native, pil)


def test_native_decode_grayscale_png(rng):
    """libpng's simplified API converts gray -> RGB like PIL convert."""
    g = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    data = _encoded(g, "PNG")
    native = decode_rgb(data)
    if native is None:
        pytest.skip("native decoder not built")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native, pil)


def test_garbage_returns_none():
    assert decode_rgb(b"not an image at all") is None


def test_transform_ndarray_fast_path(rng):
    """HostImageTransform returns a target-size RGB8 ndarray untouched in
    val mode (the native-decode serving path) and still resizes others."""
    from spatial_clip_tpu.models.transforms import PreprocessCfg, image_transform_v2

    t = image_transform_v2(PreprocessCfg(size=32), is_train=False)
    exact = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    out = t(exact)
    assert out is exact  # zero-copy
    big = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
    out2 = t(big)
    assert out2.shape == (32, 32, 3)
