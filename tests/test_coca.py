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


def test_coca_sample_generate_top_k_and_top_p(coca_bundle):
    import jax

    from spatial_clip_tpu.models.coca import generate, sample_generate

    rng = np.random.default_rng(4)
    images = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    for gtype in ("top_k", "top_p"):
        seq = np.asarray(sample_generate(
            coca_bundle.model, coca_bundle.params, images,
            sot_token=1, eot_token=2, rng=jax.random.PRNGKey(0),
            max_len=8, generation_type=gtype, min_seq_len=3,
        ))
        assert seq.shape == (2, 16)
        assert (seq[:, 0] == 1).all()
        # MinLengthLogitsProcessor: no EOS among the first min_seq_len-1
        # generated tokens
        assert (seq[:, 1:3] != 2).all()
        # final emitted token is forced EOS (or the row finished earlier)
        ended = (seq == 2).any(axis=1)
        assert ended.all()
    # top_k=1 at any temperature is argmax == greedy
    from spatial_clip_tpu.models.coca import greedy_generate

    s1 = np.asarray(sample_generate(
        coca_bundle.model, coca_bundle.params, images,
        sot_token=1, eot_token=2, rng=jax.random.PRNGKey(1),
        max_len=6, generation_type="top_k", top_k=1, min_seq_len=0,
    ))
    g = np.asarray(greedy_generate(
        coca_bundle.model, coca_bundle.params, images,
        sot_token=1, eot_token=2, max_len=6,
    ))
    # identical until the forced-EOS tail (greedy has no forced EOS)
    np.testing.assert_array_equal(s1[:, :5], g[:, :5])


def test_coca_generate_dispatcher(coca_bundle):
    import jax
    import pytest

    from spatial_clip_tpu.models.coca import generate

    rng = np.random.default_rng(5)
    images = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    for gtype in ("beam_search", "greedy", "top_k", "top_p"):
        seq = np.asarray(generate(
            coca_bundle.model, coca_bundle.params, images,
            sot_token=1, eot_token=2, seq_len=5, generation_type=gtype,
            num_beams=2, rng=jax.random.PRNGKey(0),
        ))
        assert seq.shape == (1, 16) and seq[0, 0] == 1
    with pytest.raises(ValueError, match="generation_type"):
        generate(coca_bundle.model, coca_bundle.params, images,
                 generation_type="nope")


def test_top_warpers_unit():
    import jax.numpy as jnp

    from spatial_clip_tpu.models.coca import _top_k_warp, _top_p_warp

    logits = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    k2 = np.asarray(_top_k_warp(logits, 2))
    assert (k2[0, :2] <= -1e8).all() and (k2[0, 2:] == [2.0, 3.0]).all()
    # top_p ~ 1.0 keeps everything
    pall = np.asarray(_top_p_warp(logits, 0.9999))
    np.testing.assert_array_equal(pall, np.asarray(logits))
    # tiny p keeps only the argmax (min_tokens_to_keep=1)
    p1 = np.asarray(_top_p_warp(logits, 1e-6))
    assert (p1[0, :3] <= -1e8).all() and p1[0, 3] == 3.0


def test_coca_evaluate_emits_val_generative_loss(coca_bundle):
    """Eval on a CoCa bundle reports caption CE as val_generative_loss
    (ref: open_clip_train/train.py:324-360 maybe_compute_generative_loss)."""
    from spatial_clip_tpu.parallel.mesh import make_mesh
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    trainer = Trainer(
        coca_bundle,
        loss=make_loss("coca"),
        config=TrainerConfig(total_steps=2, warmup_steps=1, augment=False),
        mesh=make_mesh(),
    )
    state = trainer.init_state()
    rng = np.random.default_rng(7)
    B = 8
    batch = {
        "images": rng.integers(0, 255, (B, 32, 32, 3), dtype=np.uint8),
        "texts": rng.integers(1, 512, (B, 16)).astype(np.int32),
    }
    result = trainer.evaluate(state, [batch])
    assert "val_generative_loss" in result
    assert np.isfinite(result["val_generative_loss"])
    assert result["val_generative_loss"] > 0
