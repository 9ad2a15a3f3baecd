"""Mesh / sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spatial_clip_tpu import create_model
from spatial_clip_tpu.parallel.mesh import (
    batch_sharding,
    local_batch_size,
    make_mesh,
    process_shard_indices,
)
from spatial_clip_tpu.parallel.sharding import infer_param_shardings, shard_params


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh(axes=("data", "model"), axis_sizes=(4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}
    assert local_batch_size(32, mesh) == 4
    start, stop = process_shard_indices(100)
    assert (start, stop) == (0, 100)  # single host owns everything


def test_tensor_parallel_forward_matches_replicated(tiny_bundle):
    """ViT params sharded over a 'model' axis must produce identical
    embeddings (GSPMD inserts the collectives)."""
    mesh = make_mesh(axes=("data", "model"), axis_sizes=(2, 4))
    shardings = infer_param_shardings(tiny_bundle.params, mesh)
    # check the rules hit the big kernels
    flat = dict(
        (("/".join(map(str, jax.tree_util.keystr(p).strip("'[]").split("']['"))), s))
        for p, s in jax.tree_util.tree_leaves_with_path(shardings)
    )
    qkv = [s for k, s in flat.items() if "qkv" in k and "kernel" in k]
    assert all(s.spec == P(None, "model") for s in qkv)

    params_tp = shard_params(tiny_bundle.params, mesh)
    model = tiny_bundle.model
    images = np.random.default_rng(0).uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    texts = np.ones((8, 16), np.int32)

    @jax.jit
    def fwd(p, x, t):
        out = model.apply({"params": p}, x, t)
        return out["image_features"], out["text_features"]

    x = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
    t = jax.device_put(jnp.asarray(texts), batch_sharding(mesh))
    img_tp, txt_tp = fwd(params_tp, x, t)
    img_ref, txt_ref = fwd(tiny_bundle.params, jnp.asarray(images), jnp.asarray(texts))
    np.testing.assert_allclose(np.asarray(img_tp), np.asarray(img_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(txt_tp), np.asarray(txt_ref), rtol=2e-5, atol=2e-6)


def test_hybrid_mesh_single_slice():
    from spatial_clip_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh()
    assert mesh.shape["replica"] == 1
    assert mesh.shape["data"] == 8


@pytest.mark.slow
def test_trainer_tensor_parallel_mesh(rng):
    """dp x tp: a (4 data, 2 model) mesh trains with TP-sharded params +
    moments (computation-follows-sharding) and matches the replicated
    trainer's loss trajectory."""
    import jax
    import numpy as np

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.parallel.mesh import make_mesh
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    def build(mesh):
        bundle = create_model("ViT-Test", precision="fp32", seed=0)
        tr = Trainer(
            bundle, loss=make_loss("spatial", cap_logit_scale=50.0),
            config=TrainerConfig(warmup_steps=1, total_steps=4, augment=False,
                                 log_every=10**9, seed=0),
            mesh=mesh,
        )
        return tr, tr.make_train_step(), tr.init_state()

    r = np.random.default_rng(0)
    B = 8
    tid = np.arange(B, dtype=np.int32)
    batch = {
        "images": r.integers(0, 255, (B, 32, 32, 3), dtype=np.uint8),
        "texts": r.integers(0, 512, (B, 16)).astype(np.int32),
        "image_tile_ids": tid, "text_tile_ids": tid,
        "neighbor_tile_ids": r.integers(-1, B, (B, 4)).astype(np.int32),
        "neighbor_alphas": r.uniform(0, 1, (B, 4)).astype(np.float32),
    }
    tp_mesh = make_mesh(("data", "model"), (4, 2))
    dp_mesh = make_mesh(("data",))
    tr_tp, step_tp, st_tp = build(tp_mesh)
    tr_dp, step_dp, st_dp = build(dp_mesh)
    # params really are sharded over the model axis
    qkv = st_tp.params["visual"]["transformer"]["resblocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    for _ in range(2):
        st_tp, m_tp = step_tp(st_tp, tr_tp._device_batch(batch))
        st_dp, m_dp = step_dp(st_dp, tr_dp._device_batch(batch))
    np.testing.assert_allclose(
        float(np.asarray(m_tp["loss"])), float(np.asarray(m_dp["loss"])),
        rtol=2e-4,
    )
