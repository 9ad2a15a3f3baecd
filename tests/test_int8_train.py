"""int8-forward training GEMMs (ops/int8_train + the transformer INT8_GEMM
knob). Forward must match the exact product within quantization error;
backward must be the exact straight-through gradients; the knob must not
change the param tree (checkpoint compatibility)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spatial_clip_tpu.models.transformer as tfm
from spatial_clip_tpu.ops.int8_train import int8_matmul, supported


def test_forward_close_to_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (256, 384)), jnp.float32)
    y = int8_matmul(x, w, jnp.float32)
    ref = x @ w
    # per-row/per-channel symmetric int8: relative error ~<1% on gaussian data
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.01, rel


def test_unsupported_shapes_fall_back_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (8, 100)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (100, 96)), jnp.float32)
    assert not supported(100, 96)
    np.testing.assert_allclose(
        np.asarray(int8_matmul(x, w, jnp.float32)), np.asarray(x @ w),
        rtol=1e-6)


def test_backward_is_straight_through():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (4, 16, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (128, 256)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (4, 16, 256)), jnp.float32)

    def f_q(x, w):
        return jnp.vdot(g, int8_matmul(x, w, jnp.float32))

    def f_exact(x, w):
        return jnp.vdot(g, x @ w)

    dxq, dwq = jax.grad(f_q, argnums=(0, 1))(x, w)
    dxe, dwe = jax.grad(f_exact, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxq), np.asarray(dxe), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwq), np.asarray(dwe), rtol=2e-5,
                               atol=1e-5)


def test_knob_preserves_param_tree_and_runs():
    """ResidualBlock under INT8_GEMM: identical param tree, finite grads,
    output close to the dense block (same init)."""
    B, L, D = 2, 10, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (B, L, D)), jnp.float32)
    block = tfm.ResidualBlock(width=D, heads=4, dtype=jnp.float32)
    old = tfm.INT8_GEMM
    try:
        tfm.INT8_GEMM = False
        params = block.init(jax.random.PRNGKey(0), x)
        y_dense = block.apply(params, x)
        tfm.INT8_GEMM = True
        params_q = block.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_q)
        y_q = block.apply(params, x)
        rel = float(jnp.linalg.norm(y_q - y_dense) /
                    jnp.linalg.norm(y_dense))
        assert rel < 0.05, rel

        def loss(p):
            return jnp.sum(block.apply(p, x) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        # the STE grads must touch every param (no dead branches)
        assert sum(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves) == \
            len(leaves)
    finally:
        tfm.INT8_GEMM = old


def test_full_train_step_under_int8():
    """One Trainer step with INT8_GEMM on: finite loss, params update, and
    the state tree is identical to the bf16 path's (checkpoint compat).
    Widths are %128 so every projection actually takes the int8 route."""
    import jax

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    tiny_bundle = create_model(
        "ViT-Test", precision="bf16", seed=0, embed_dim=128,
        vision_cfg={"image_size": 32, "layers": 2, "width": 128,
                    "patch_size": 16, "heads": 4},
        text_cfg={"context_length": 16, "vocab_size": 512, "width": 128,
                  "heads": 4, "layers": 2},
    )
    old = tfm.INT8_GEMM
    try:
        tfm.INT8_GEMM = True
        tr = Trainer(
            tiny_bundle, loss=make_loss("spatial", cap_logit_scale=50.0),
            config=TrainerConfig(warmup_steps=1, total_steps=4, augment=True,
                                 color_jitter=0.2, log_every=10**9, seed=0),
        )
        step = tr.make_train_step()
        state = tr.init_state()
        rng = np.random.default_rng(0)
        B = 8
        size = tiny_bundle.cfg.vision_cfg.image_size
        tid = np.arange(B, dtype=np.int32)
        db = tr._device_batch({
            "images": rng.integers(0, 255, (B, size, size, 3),
                                   dtype=np.uint8),
            "texts": rng.integers(
                0, tiny_bundle.cfg.text_cfg.vocab_size,
                (B, tiny_bundle.cfg.text_cfg.context_length)
            ).astype(np.int32),
            "image_tile_ids": tid, "text_tile_ids": tid,
            "neighbor_tile_ids": rng.integers(-1, B, (B, 4)).astype(np.int32),
            "neighbor_alphas": rng.uniform(0, 1, (B, 4)).astype(np.float32),
        })
        state2, m = step(state, db)
        assert np.isfinite(float(np.asarray(m["loss"])))
        assert jax.tree_util.tree_structure(state.params) == \
            jax.tree_util.tree_structure(state2.params)
    finally:
        tfm.INT8_GEMM = old


@pytest.mark.parametrize("shape", [(2, 5, 128), (6, 128)])
def test_apply_dense_int8_routing(shape):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.05, (128, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)
    old = tfm.INT8_GEMM
    try:
        tfm.INT8_GEMM = True
        y = tfm._apply_dense(k, b, x, jnp.float32)
    finally:
        tfm.INT8_GEMM = old
    ref = x @ k + b
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
