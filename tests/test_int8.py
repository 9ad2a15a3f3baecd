"""int8 dot_general serving path (models/quantize.py int8_dot +
mlp_impl='int8'; ref: src/open_clip/utils.py:67-92 bnb replace_linear)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def test_int8_dot_close_to_fp32():
    from spatial_clip_tpu.models.quantize import int8_dot, quantize_array

    # own fixed seed: the error bound is statistical, so the test must not
    # depend on how much of the shared session rng earlier tests consumed
    rng = np.random.default_rng(7)
    x = rng.normal(size=(64, 256)).astype(np.float32)
    w = (rng.normal(size=(256, 128)) / 16).astype(np.float32)
    q, s = quantize_array(w)
    out = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)))
    ref = x @ w
    # int8 weights + per-row int8 activations: ~1% relative error budget
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    assert np.max(np.abs(out - ref) / denom) < 0.05


def test_int8_mlp_model_parity(rng):
    """A dense checkpoint converted with convert_tree_mlp_int8 drives the
    mlp_impl='int8' model to near-identical embeddings."""
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.models.quantize import convert_tree_mlp_int8

    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8).astype(np.float32)
    texts = rng.integers(0, 512, (2, 16)).astype(np.int32)
    dense = create_model("ViT-Test", precision="fp32", seed=0)
    q8 = create_model("ViT-Test", precision="fp32", seed=0, mlp_impl="int8")
    qparams = convert_tree_mlp_int8(dense.params)

    i_d = np.asarray(dense.encode_image(imgs, normalize=True))
    i_q = np.asarray(q8.encode_image(imgs, params=qparams, normalize=True))
    t_d = np.asarray(dense.encode_text(texts, normalize=True))
    t_q = np.asarray(q8.encode_text(texts, params=qparams, normalize=True))
    # cosine similarity of normalized embeddings
    assert float((i_d * i_q).sum(axis=-1).min()) > 0.99
    assert float((t_d * t_q).sum(axis=-1).min()) > 0.99
