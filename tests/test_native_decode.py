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


def test_native_declines_non_parity_formats(rng):
    """RGBA and 16-bit PNGs are NOT decoded natively (libpng's simplified
    API composites alpha / rescales 16->8 differently from PIL convert);
    the native path must decline so callers use the PIL fallback."""
    rgba = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
    assert decode_rgb(_encoded(rgba, "PNG")) is None

    buf = io.BytesIO()
    img16 = Image.new("I;16", (8, 8))
    img16.putdata([int(v) for v in
                   rng.integers(0, 65535, 64, dtype=np.uint16)])
    img16.save(buf, format="PNG")
    assert decode_rgb(buf.getvalue()) is None


def test_loader_keeps_pil_contract_for_user_callables(tmp_path, rng):
    """A user-supplied preprocess_fn (no accepts_ndarray attr) must receive
    a PIL Image even when the native decoder handled the bytes."""
    import tarfile

    tile = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    shard = tmp_path / "s-000000.tar"
    with tarfile.open(shard, "w") as tf:
        for name, payload in (("a.png", _encoded(tile, "PNG")),
                              ("a.txt", b"hello")):
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

    from spatial_clip_tpu.data.datasets.iterable_shards import (
        IterableTarDataset,
    )

    seen = []

    def user_fn(img):
        seen.append(type(img))
        return np.asarray(img.convert("RGB"))  # PIL-only API

    ds = IterableTarDataset([str(shard)], preprocess_fn=user_fn)
    samples = list(ds)
    assert len(samples) == 1
    assert all(issubclass(t, Image.Image) for t in seen)
