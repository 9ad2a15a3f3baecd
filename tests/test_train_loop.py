"""End-to-end training smoke tests on the virtual 8-device mesh
(the JAX analogue of the reference's fast_dev_run + ddp_sim tests,
ref: tests/test_train.py:12-21,65-77)."""
import numpy as np
import pytest

from spatial_clip_tpu import create_model
from spatial_clip_tpu.data.datamodule import DataLoader
from spatial_clip_tpu.data.datasets import SyntheticSpatialDataset
from spatial_clip_tpu.losses import make_loss
from spatial_clip_tpu.models.tokenizer import HashTokenizer
from spatial_clip_tpu.parallel.mesh import make_mesh
from spatial_clip_tpu.train.loop import Trainer, TrainerConfig


def _make_data(n=32, image_size=32, batch=8, k=4):
    tok = HashTokenizer(vocab_size=512, context_length=16)
    ds = SyntheticSpatialDataset(
        num_samples=n, image_size=image_size, k_neighbors=k,
        sentence_len=8, tokenizer=tok,
    )
    return lambda: DataLoader(ds, batch_size=batch, shuffle=True, drop_last=True)


@pytest.fixture(scope="module")
def trainer(tiny_bundle):
    cfg = TrainerConfig(
        learning_rate=1e-3,
        warmup_steps=2,
        total_steps=50,
        log_every=1,
        augment=True,
        seed=0,
    )
    return Trainer(
        tiny_bundle,
        loss=make_loss("spatial", temp_reg_weight=0.1, cap_logit_scale=50.0),
        config=cfg,
        mesh=make_mesh(),
    )


def test_fit_one_epoch_spatial_loss(trainer):
    factory = _make_data()
    state, metrics = trainer.fit(factory, factory, epochs=1, steps_per_epoch=3)
    assert int(state.step) == 3
    assert np.isfinite(metrics["loss"])
    assert 0 <= metrics["R@1"] <= 1
    assert "val/image_to_text_R@1" in metrics
    assert np.isfinite(metrics["val/loss"])
    assert metrics["pairs_per_sec_per_chip"] > 0


def test_loss_decreases_on_overfit(tiny_bundle):
    """Overfit a tiny fixed batch — loss must drop (sanity of grads+optim)."""
    cfg = TrainerConfig(
        learning_rate=3e-3, warmup_steps=1, total_steps=40,
        augment=False, log_every=100,
    )
    tr = Trainer(tiny_bundle, loss=make_loss("clip"), config=cfg)
    factory = _make_data(n=8, batch=8)
    step = tr.make_train_step()
    state = tr.init_state()
    batch = next(iter(factory()))
    dbatch = tr._device_batch(batch)
    first = None
    for i in range(25):
        state, m = step(state, dbatch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first * 0.7


def test_grad_accum_runs(tiny_bundle):
    cfg = TrainerConfig(
        grad_accum=2, warmup_steps=1, total_steps=10, augment=False, log_every=1
    )
    tr = Trainer(tiny_bundle, loss=make_loss("clip"), config=cfg)
    factory = _make_data(n=16, batch=16)
    state, metrics = tr.fit(factory, None, epochs=1, steps_per_epoch=1)
    assert np.isfinite(metrics["loss"])


def test_checkpoint_roundtrip(tmp_path, tiny_bundle):
    cfg = TrainerConfig(
        warmup_steps=1, total_steps=10, augment=False, log_every=1,
        ckpt_dir=str(tmp_path / "ckpts"),
    )
    tr = Trainer(tiny_bundle, loss=make_loss("clip"), config=cfg)
    factory = _make_data(n=16, batch=8)
    state, _ = tr.fit(factory, None, epochs=1, steps_per_epoch=2)
    assert tr.ckpt.latest_step() == 2
    # resume: continues from step 2
    state2, _ = tr.fit(factory, None, epochs=1, steps_per_epoch=2, resume="latest")
    assert int(state2.step) == 4
    # logit_scale stays clamped in [0, ln100]
    import math

    ls = float(state2.params["logit_scale"])
    assert 0.0 <= ls <= math.log(100.0) + 1e-6


def test_tower_locking_freezes_params(tiny_bundle):
    import jax
    from spatial_clip_tpu.losses import make_loss

    cfg = TrainerConfig(
        learning_rate=1e-2, warmup_steps=1, total_steps=10, augment=False,
        log_every=1, frozen_prefixes=("visual",),
    )
    tr = Trainer(tiny_bundle, loss=make_loss("clip"), config=cfg)
    step = tr.make_train_step()
    state = tr.init_state()
    before = jax.tree.map(np.array, state.params)
    batch = next(iter(_make_data(n=8, batch=8)()))
    db = tr._device_batch(batch)
    for _ in range(3):  # step past the lr warmup from 0
        state, _ = step(state, db)
    after = state.params
    # frozen image tower unchanged
    np.testing.assert_array_equal(
        np.asarray(after["visual"]["conv1"]["kernel"]),
        before["visual"]["conv1"]["kernel"],
    )
    # text tower moved
    assert not np.array_equal(
        np.asarray(after["text"]["token_embedding"]["embedding"]),
        before["text"]["token_embedding"]["embedding"],
    )


def test_cached_accum_matches_full_batch_grads(tiny_bundle):
    """Cached-feature accumulation must reproduce the full-batch gradient."""
    import jax
    from spatial_clip_tpu.losses import make_loss

    cfg = TrainerConfig(augment=False, warmup_steps=1, total_steps=10, log_every=1)
    tr = Trainer(tiny_bundle, loss=make_loss("spatial"), config=cfg)
    batch = next(iter(_make_data(n=16, batch=16)()))
    db = {k: v for k, v in tr._device_batch(batch).items()}
    rng = jax.random.PRNGKey(7)

    # reference: one full-batch grad
    def full_loss(params):
        loss, _ = tr._loss_and_metrics(params, db, rng, deterministic=False)
        return loss

    g_full = jax.grad(full_loss)(tr.bundle.params)
    loss_acc, logits, g_acc = tr._cached_accum_grads(tr.bundle.params, db, rng, accum=4)
    # NOTE: augmentation off and dropout absent -> pass-1/pass-2 features equal
    # per-microbatch rngs differ from the full-batch rng, so compare with
    # augment disabled (deterministic forward)
    assert np.isfinite(float(loss_acc))
    assert logits.shape == (16, 16)
    for a, b in zip(jax.tree.leaves(g_acc), jax.tree.leaves(g_full)):
        if a.shape == ():  # logit_scale grad accumulates accum times (ref quirk)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_training_determinism(tiny_bundle):
    """Same seed + same data -> bitwise-same loss trajectory."""
    from spatial_clip_tpu.losses import make_loss

    def run():
        cfg = TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, total_steps=10,
            augment=True, color_jitter=0.2, log_every=1, seed=123,
        )
        tr = Trainer(tiny_bundle, loss=make_loss("spatial"), config=cfg)
        step = tr.make_train_step()
        state = tr.init_state()
        batch = next(iter(_make_data(n=8, batch=8)()))
        db = tr._device_batch(batch)
        out = []
        for _ in range(3):
            state, m = step(state, db)
            out.append(float(m["loss"]))
        return out

    np.testing.assert_array_equal(run(), run())
