"""CoCa model tests: forward schema, caption loss, greedy generation,
end-to-end train step."""
import numpy as np
import pytest

from spatial_clip_tpu import create_model
from spatial_clip_tpu.losses import make_loss


@pytest.fixture(scope="module")
def coca_bundle():
    return create_model("coca_ViT-Test", precision="fp32", seed=0)


def test_coca_forward_schema(coca_bundle):
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    text = rng.integers(1, 512, (2, 16)).astype(np.int32)
    out = coca_bundle(images=images, text=text)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    assert out["caption_logits"].shape == (2, 15, 512)
    np.testing.assert_array_equal(np.asarray(out["caption_labels"]), text[:, 1:])


def test_coca_loss_and_grads(coca_bundle):
    import jax

    rng = np.random.default_rng(1)
    images = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    text = rng.integers(1, 512, (4, 16)).astype(np.int32)
    loss = make_loss("coca", caption_loss_weight=2.0)

    def f(params):
        out = coca_bundle.model.apply({"params": params}, images, text)
        return loss(**out)["contrastive_loss"]

    val, grads = jax.value_and_grad(f)(coca_bundle.params)
    assert np.isfinite(float(val))
    gnorm = sum(float(np.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_coca_greedy_generate(coca_bundle):
    from spatial_clip_tpu.models.coca import greedy_generate

    rng = np.random.default_rng(2)
    images = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    seq = greedy_generate(
        coca_bundle.model, coca_bundle.params, images,
        sot_token=1, eot_token=2, max_len=6,
    )
    seq = np.asarray(seq)
    assert seq.shape == (2, 16)
    assert (seq[:, 0] == 1).all()
    assert ((seq >= 0) & (seq < 512)).all()


def test_coca_beam_search(coca_bundle):
    import jax.numpy as jnp

    from spatial_clip_tpu.models.coca import beam_search_generate, greedy_generate

    rng = np.random.default_rng(3)
    images = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    seq = beam_search_generate(
        coca_bundle.model, coca_bundle.params, images,
        sot_token=1, eot_token=2, max_len=6, beam_size=3,
    )
    seq = np.asarray(seq)
    assert seq.shape == (2, 16)
    assert (seq[:, 0] == 1).all()
    assert ((seq >= 0) & (seq < 512)).all()
    # beam-1 equals greedy
    b1 = np.asarray(beam_search_generate(
        coca_bundle.model, coca_bundle.params, images,
        sot_token=1, eot_token=2, max_len=6, beam_size=1,
    ))
    g = np.asarray(greedy_generate(
        coca_bundle.model, coca_bundle.params, images,
        sot_token=1, eot_token=2, max_len=6,
    ))
    np.testing.assert_array_equal(b1[:, :7], g[:, :7])
