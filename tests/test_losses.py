"""Loss semantics tests.

Strategy (SURVEY.md §4): numpy oracles implement the published loss math
independently; sharded paths (shard_map over the virtual 8-device CPU mesh)
must agree bit-tightly with the global formulation — the JAX analogue of the
reference's CPU-simulated DDP tests (ref: tests/test_train.py:65-77) and its
rank-simulation notebooks.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from spatial_clip_tpu.losses import build_spatial_soft_labels, make_loss
from spatial_clip_tpu.losses.contrastive import clip_loss, siglip_loss, spatial_loss
from spatial_clip_tpu.parallel.mesh import make_mesh

N_DEV = 8


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _np_log_softmax(x):
    x = x - x.max(axis=1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=1, keepdims=True))


def _np_clip_loss(img, txt, scale):
    """Independent numpy oracle for symmetric InfoNCE."""
    logits = scale * img @ txt.T
    n = len(img)
    ls_i = _np_log_softmax(logits)
    ls_t = _np_log_softmax(logits.T)
    return -0.5 * (ls_i[np.arange(n), np.arange(n)].mean() + ls_t[np.arange(n), np.arange(n)].mean())


def _np_spatial_labels(all_ids, gt_cols, nbr_ids, nbr_alphas, scale=1.0):
    """Oracle following the reference's dict-based algorithm
    (losses.py:91-111) for unique tile ids."""
    B, N = len(gt_cols), len(all_ids)
    id_to_col = {int(t): i for i, t in enumerate(all_ids)}
    labels = np.zeros((B, N), dtype=np.float32)
    labels[np.arange(B), gt_cols] = 1.0
    for i in range(B):
        for t, a in zip(nbr_ids[i], nbr_alphas[i]):
            a = max(float(a) * scale, 0.0)
            if int(t) < 0 or a <= 0:
                continue
            col = id_to_col.get(int(t))
            if col is not None:
                labels[i, col] += a
    return labels / np.maximum(labels.sum(axis=1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(42)
    B, D, K = 16, 8, 3
    img = _unit(rng, B, D)
    txt = _unit(rng, B, D)
    tile_ids = rng.permutation(1000)[:B].astype(np.int32)
    # neighbors drawn from in-batch tile ids (plus some misses and padding)
    nbr = np.full((B, K), -1, dtype=np.int32)
    alphas = np.zeros((B, K), dtype=np.float32)
    for i in range(B):
        picks = rng.choice(B, size=K, replace=False)
        for j, p in enumerate(picks):
            if rng.uniform() < 0.3:
                continue  # leave padded
            nbr[i, j] = tile_ids[p] if rng.uniform() < 0.8 else 9999  # some missing
            alphas[i, j] = rng.uniform(0.1, 1.0)
    return img, txt, tile_ids, nbr, alphas


def test_clip_loss_matches_numpy_oracle(feats):
    img, txt, *_ = feats
    got = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0))
    want = _np_clip_loss(img, txt, 10.0)
    np.testing.assert_allclose(float(got["contrastive_loss"]), want, rtol=1e-5)


def test_spatial_labels_match_reference_algorithm(feats):
    img, txt, tile_ids, nbr, alphas = feats
    B = len(img)
    got = np.asarray(
        build_spatial_soft_labels(
            jnp.asarray(tile_ids), jnp.arange(B, dtype=jnp.int32),
            jnp.asarray(nbr), jnp.asarray(alphas),
        )
    )
    want = _np_spatial_labels(tile_ids, np.arange(B), nbr, alphas)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_spatial_loss_reduces_to_clip_loss_when_no_neighbors(feats):
    img, txt, tile_ids, _, _ = feats
    B, K = len(img), 3
    out_sp = spatial_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0),
        jnp.asarray(tile_ids), jnp.asarray(tile_ids),
        jnp.full((B, K), -1, jnp.int32), jnp.zeros((B, K), jnp.float32),
    )
    out_clip = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0))
    np.testing.assert_allclose(
        float(out_sp["contrastive_loss"]), float(out_clip["contrastive_loss"]), rtol=1e-5
    )


def test_cap_logit_scale_straight_through(feats):
    img, txt, tile_ids, nbr, alphas = feats

    def loss_of_scale(log_s):
        return spatial_loss(
            jnp.asarray(img), jnp.asarray(txt), jnp.exp(log_s),
            jnp.asarray(tile_ids), jnp.asarray(tile_ids),
            jnp.asarray(nbr), jnp.asarray(alphas),
            cap_logit_scale=5.0,
        )["contrastive_loss"]

    # capped forward: loss at exp(s)=100 equals loss at cap 5.0
    uncapped = spatial_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(5.0),
        jnp.asarray(tile_ids), jnp.asarray(tile_ids),
        jnp.asarray(nbr), jnp.asarray(alphas),
    )["contrastive_loss"]
    capped = loss_of_scale(jnp.float32(np.log(100.0)))
    np.testing.assert_allclose(float(capped), float(uncapped), rtol=1e-5)
    # ...but gradient still flows (straight-through estimator)
    g = jax.grad(loss_of_scale)(jnp.float32(np.log(100.0)))
    assert float(jnp.abs(g)) > 0


def test_temp_reg_increases_loss(feats):
    img, txt, tile_ids, nbr, alphas = feats
    args = (
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0),
        jnp.asarray(tile_ids), jnp.asarray(tile_ids),
        jnp.asarray(nbr), jnp.asarray(alphas),
    )
    base = spatial_loss(*args)["contrastive_loss"]
    reg = spatial_loss(*args, temp_reg_weight=1.0)["contrastive_loss"]
    assert float(reg) >= float(base)


def _sharded_loss(loss_kwargs, img, txt, tile_ids, nbr, alphas, scale):
    """Run spatial_loss inside shard_map over the 8-device CPU mesh."""
    mesh = make_mesh(devices=jax.devices()[:N_DEV])

    fn = functools.partial(spatial_loss, axis_name="data", **loss_kwargs)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
    )
    def run(img, txt, s, img_ids, txt_ids, nbr, alphas):
        out = fn(
            image_features=img, text_features=txt, logit_scale=s[0],
            image_tile_ids=img_ids, text_tile_ids=txt_ids,
            neighbor_tile_ids=nbr, neighbor_alphas=alphas,
        )
        return out["contrastive_loss"]

    return run(
        jnp.asarray(img), jnp.asarray(txt), jnp.full((1,), scale, jnp.float32),
        jnp.asarray(tile_ids), jnp.asarray(tile_ids),
        jnp.asarray(nbr), jnp.asarray(alphas),
    )


def test_sharded_spatial_loss_matches_global(feats):
    """8-way sharded (all_gather + shifted diag) == single-device global."""
    img, txt, tile_ids, nbr, alphas = feats
    global_loss = spatial_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0),
        jnp.asarray(tile_ids), jnp.asarray(tile_ids),
        jnp.asarray(nbr), jnp.asarray(alphas),
    )["contrastive_loss"]
    sharded = _sharded_loss({}, img, txt, tile_ids, nbr, alphas, 10.0)
    np.testing.assert_allclose(float(sharded), float(global_loss), rtol=1e-5)


def test_sharded_clip_loss_matches_global(feats):
    img, txt, *_ = feats
    mesh = make_mesh(devices=jax.devices()[:N_DEV])

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    def run(i, t):
        return clip_loss(i, t, jnp.float32(10.0), axis_name="data")["contrastive_loss"]

    got = run(jnp.asarray(img), jnp.asarray(txt))
    want = _np_clip_loss(img, txt, 10.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


@pytest.mark.parametrize("impl", ["gather", "shift", "bidir"])
def test_siglip_ring_impls_match_global(feats, impl):
    img, txt, *_ = feats
    mesh = make_mesh(devices=jax.devices()[:N_DEV])
    # single-device global reference
    want = siglip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0), jnp.float32(-10.0)
    )["contrastive_loss"] * 1.0  # per-local-B normalization -> recompute below

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    def run(i, t):
        return siglip_loss(
            i, t, jnp.float32(10.0), jnp.float32(-10.0),
            axis_name="data", dist_impl=impl,
        )["contrastive_loss"]

    got = float(run(jnp.asarray(img), jnp.asarray(txt)))
    # global single-device loss normalizes by full B; sharded normalizes by
    # local B then pmean -> same value
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_spatial_loss_grads_finite(feats):
    img, txt, tile_ids, nbr, alphas = feats

    def f(img, txt, log_scale):
        return spatial_loss(
            img, txt, jnp.exp(log_scale),
            jnp.asarray(tile_ids), jnp.asarray(tile_ids),
            jnp.asarray(nbr), jnp.asarray(alphas),
            temp_reg_weight=0.1,
        )["contrastive_loss"]

    g_img, g_txt, g_s = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(np.log(10.0))
    )
    for g in (g_img, g_txt, g_s):
        assert np.isfinite(np.asarray(g)).all()


def test_make_loss_dispatch(feats):
    img, txt, tile_ids, nbr, alphas = feats
    loss = make_loss("spatial", temp_reg_weight=0.0)
    everything = dict(
        image_features=jnp.asarray(img),
        text_features=jnp.asarray(txt),
        logit_scale=jnp.float32(10.0),
        image_tile_ids=jnp.asarray(tile_ids),
        text_tile_ids=jnp.asarray(tile_ids),
        neighbor_tile_ids=jnp.asarray(nbr),
        neighbor_alphas=jnp.asarray(alphas),
        images=jnp.zeros((2, 2)),  # extra keys are ignored
        raw_text=["a"] * len(img),
    )
    out = loss(**everything)
    assert "contrastive_loss" in out
    clip = make_loss("clip")
    out2 = clip(**everything)
    assert np.isfinite(float(out2["contrastive_loss"]))
    with pytest.raises(TypeError):
        make_loss("spatial")(image_features=jnp.asarray(img))


@pytest.mark.slow
def test_ring_spatial_loss_matches_global(feats):
    """Ring (ppermute, O(local_B) memory) == global all-gather formulation."""
    from spatial_clip_tpu.losses.ring import ring_spatial_loss

    img, txt, tile_ids, nbr, alphas = feats
    want = spatial_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0),
        jnp.asarray(tile_ids), jnp.asarray(tile_ids),
        jnp.asarray(nbr), jnp.asarray(alphas), cap_logit_scale=50.0,
    )["contrastive_loss"]
    mesh = make_mesh(devices=jax.devices()[:N_DEV])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
    )
    def run(i, t, ids, nb, al):
        return ring_spatial_loss(
            i, t, jnp.float32(10.0), ids, ids, nb, al,
            axis_name="data", cap_logit_scale=50.0,
        )["contrastive_loss"]

    got = run(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(tile_ids),
        jnp.asarray(nbr), jnp.asarray(alphas),
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # gradients flow through the ppermute ring
    def loss_of_feats(i, t):
        return run(i, t, jnp.asarray(tile_ids), jnp.asarray(nbr), jnp.asarray(alphas))

    gi, gt_ = jax.grad(loss_of_feats, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(txt))
    assert np.isfinite(np.asarray(gi)).all() and np.abs(np.asarray(gi)).sum() > 0

    # ...and match the global formulation's gradients
    def global_loss(i, t):
        return spatial_loss(
            i, t, jnp.float32(10.0), jnp.asarray(tile_ids), jnp.asarray(tile_ids),
            jnp.asarray(nbr), jnp.asarray(alphas), cap_logit_scale=50.0,
        )["contrastive_loss"]

    gi2, gt2 = jax.grad(global_loss, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_), np.asarray(gt2), rtol=1e-4, atol=1e-6)


def test_distill_clip_loss(feats):
    from spatial_clip_tpu.losses.contrastive import distill_clip_loss

    img, txt, *_ = feats
    rng = np.random.default_rng(3)
    t_img = _unit(rng, len(img), img.shape[1])
    t_txt = _unit(rng, len(txt), txt.shape[1])
    out = distill_clip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0),
        jnp.asarray(t_img), jnp.asarray(t_txt), jnp.float32(10.0),
    )
    base = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0))
    assert float(out["contrastive_loss"]) > float(base["contrastive_loss"])
    assert np.isfinite(float(out["distill_loss"]))
    # teacher == student features -> distill term = teacher entropy; grads flow
    g = jax.grad(
        lambda i: distill_clip_loss(
            i, jnp.asarray(txt), jnp.float32(10.0),
            jnp.asarray(t_img), jnp.asarray(t_txt), jnp.float32(10.0),
        )["contrastive_loss"]
    )(jnp.asarray(img))
    assert np.isfinite(np.asarray(g)).all()


def test_siglip_reduce_impl_matches_global(feats):
    img, txt, *_ = feats
    mesh = make_mesh(devices=jax.devices()[:N_DEV])
    want = siglip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0), jnp.float32(-10.0)
    )["contrastive_loss"]

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    def run(i, t):
        return siglip_loss(
            i, t, jnp.float32(10.0), jnp.float32(-10.0),
            axis_name="data", dist_impl="reduce",
        )["contrastive_loss"]

    got = float(run(jnp.asarray(img), jnp.asarray(txt)))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)
