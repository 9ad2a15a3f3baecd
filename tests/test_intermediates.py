"""forward_intermediates API parity (ref: src/open_clip/model.py:356-452,
transformer.py:825-891, utils.py:94; reference test: tests/test_inference.py
forward_intermediates usage in timm/open_clip downstream consumers)."""
import numpy as np
import pytest

from spatial_clip_tpu import create_model


@pytest.fixture(scope="module")
def bundle():
    return create_model(
        "ViT-Test", precision="fp32", seed=0,
        vision_cfg={"image_size": 32, "patch_size": 8, "width": 64,
                    "layers": 4, "heads": 2},
        text_cfg={"context_length": 12, "vocab_size": 128, "width": 32,
                  "heads": 2, "layers": 3},
    )


def _inputs(bundle, n=2):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (n, 32, 32, 3)).astype(np.float32)
    text = rng.integers(1, 120, (n, 12)).astype(np.int32)
    return images, text


def test_default_all_blocks_nchw(bundle):
    images, text = _inputs(bundle)
    out = bundle.forward_intermediates(image=images, text=text,
                                       output_logits=True)
    assert len(out["image_intermediates"]) == 4
    # NCHW with the class token split off: (B, C, H/ps, W/ps)
    assert out["image_intermediates"][0].shape == (2, 64, 4, 4)
    assert len(out["text_intermediates"]) == 3
    assert out["text_intermediates"][0].shape == (2, 12, 32)
    assert out["image_features"].shape == (2, bundle.cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5)
    assert out["image_logits"].shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out["image_logits"]).T,
                               np.asarray(out["text_logits"]), rtol=1e-6)


def test_int_indices_take_last_n(bundle):
    images, _ = _inputs(bundle)
    out = bundle.forward_intermediates(image=images, image_indices=2,
                                       image_output_fmt="NLC")
    all_out = bundle.forward_intermediates(image=images,
                                           image_output_fmt="NLC")
    assert len(out["image_intermediates"]) == 2
    np.testing.assert_array_equal(
        np.asarray(out["image_intermediates"][0]),
        np.asarray(all_out["image_intermediates"][2]))
    # negative indices wrap
    neg = bundle.forward_intermediates(image=images, image_indices=[-1],
                                       image_output_fmt="NLC")
    np.testing.assert_array_equal(
        np.asarray(neg["image_intermediates"][0]),
        np.asarray(all_out["image_intermediates"][3]))


def test_stop_early_exact_match(bundle):
    """Depth-pruned trace returns bit-identical intermediates."""
    images, text = _inputs(bundle)
    full = bundle.forward_intermediates(
        image=images, text=text, image_indices=[0, 1], text_indices=[0],
        intermediates_only=True, image_output_fmt="NLC")
    pruned = bundle.forward_intermediates(
        image=images, text=text, image_indices=[0, 1], text_indices=[0],
        stop_early=True, intermediates_only=True, image_output_fmt="NLC")
    assert "image_features" not in pruned and "text_features" not in pruned
    for a, b in zip(full["image_intermediates"],
                    pruned["image_intermediates"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(full["text_intermediates"][0]),
        np.asarray(pruned["text_intermediates"][0]))


def test_normalize_intermediates_and_prefix(bundle):
    images, _ = _inputs(bundle)
    out = bundle.forward_intermediates(
        image=images, image_indices=[3], normalize_intermediates=True,
        image_output_extra_tokens=True, image_output_fmt="NLC")
    raw = bundle.forward_intermediates(image=images, image_indices=[3],
                                       image_output_fmt="NLC")
    assert out["image_intermediates_prefix"][0].shape == (2, 1, 64)
    # final-norm applied: per-token mean ~0 over channels
    xi = np.asarray(out["image_intermediates"][0])
    assert abs(xi.mean(axis=-1)).max() < 0.2
    assert not np.allclose(xi, np.asarray(raw["image_intermediates"][0]))


def test_unsupported_towers_raise():
    genes = 256
    b = create_model(
        "ViT-Test", precision="fp32", seed=0,
        vision_cfg={"image_size": 32, "patch_size": 8, "width": 64,
                    "layers": 2, "heads": 2},
        gene_cfg={"num_genes": genes, "width": 64, "layers": 2},
    )
    images = np.zeros((1, 32, 32, 3), np.float32)
    vec = np.zeros((1, genes), np.float32)
    with pytest.raises(ValueError, match="gene-MLP"):
        b.forward_intermediates(text=vec)
    # the ViT side still works on a gene-tower model
    out = b.forward_intermediates(image=images, intermediates_only=True)
    assert len(out["image_intermediates"]) == 2


def test_coca_forward_intermediates():
    """CoCa exposes the same forward_intermediates surface (ref:
    coca_model.py:169-268) — towers share the sown-block contract."""
    b = create_model("coca_ViT-Test", precision="fp32", seed=0)
    rng = np.random.default_rng(0)
    v = b.cfg.vision_cfg
    images = rng.uniform(0, 1, (2, v.image_size, v.image_size, 3)).astype(np.float32)
    text = rng.integers(1, b.cfg.text_cfg.vocab_size - 2,
                        (2, b.cfg.text_cfg.context_length)).astype(np.int32)
    out = b.forward_intermediates(image=images, text=text,
                                  image_output_fmt="NLC",
                                  intermediates_only=True, stop_early=True,
                                  image_indices=[0], text_indices=[0])
    assert len(out["image_intermediates"]) == 1
    assert len(out["text_intermediates"]) == 1
    assert out["image_intermediates"][0].shape[0] == 2
