"""Zipped dual-tower attention: kernel + model-level exact-parity tests.

The pair kernel (ops/fused_attention.fused_attention_pair) runs image
layer-i and text layer-i attention in ONE pallas_call (halves the
per-step custom-call count; motivation in the kernel's module comment).
These tests enforce that it is the SAME math as two single calls, and
that CLIP with ``zip_towers='on'`` reproduces the sequential towers
bit-for-bit-close on identical params (fwd and grads).

Ref analogue: open_clip runs the towers sequentially
(src/open_clip/model.py:464-479); the zip is a TPU-specific formulation,
so parity against the unzipped path IS parity against the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_clip_tpu.models.clip import CLIP
from spatial_clip_tpu.models.config import resolve_clip_cfg
from spatial_clip_tpu.ops import fused_attention as fa


def _mk(shape, scale=0.3, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * scale, dtype)


@pytest.mark.parametrize(
    "La,Da,Ha,Lb,Db,Hb",
    [
        (50, 128, 2, 77, 128, 2),  # ViT-B/32-like geometry (hd=64)
        (17, 256, 2, 26, 128, 4),  # unequal lanes/groups (hd 128 vs 32)
    ],
)
def test_pair_kernel_fwd_bwd_parity(La, Da, Ha, Lb, Db, Hb):
    B = 8
    qa = _mk((B, La, 3 * Da), seed=1)
    qb = _mk((B, Lb, 3 * Db), seed=2)
    mb = jnp.triu(jnp.full((Lb, Lb), -1e30), 1).astype(jnp.float32)

    oa_ref = fa.reference_attention(qa, None, Ha)
    ob_ref = fa.reference_attention(qb, mb, Hb)
    oa, ob = fa.fused_attention_pair(qa, None, qb, mb, Ha, Hb, True)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(oa_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(ob_ref), atol=2e-5)

    def loss_pair(qa, qb):
        oa, ob = fa.fused_attention_pair(qa, None, qb, mb, Ha, Hb, True)
        return (oa * oa).sum() * 0.5 + (ob * jnp.cos(ob)).sum()

    def loss_ref(qa, qb):
        oa = fa.reference_attention(qa, None, Ha)
        ob = fa.reference_attention(qb, mb, Hb)
        return (oa * oa).sum() * 0.5 + (ob * jnp.cos(ob)).sum()

    gp = jax.grad(loss_pair, argnums=(0, 1))(qa, qb)
    gr = jax.grad(loss_ref, argnums=(0, 1))(qa, qb)
    for p, r in zip(gp, gr):
        denom = float(jnp.abs(r).max()) + 1e-9
        assert float(jnp.abs(p - r).max()) / denom < 1e-5


def test_pair_kernel_sharded_batch_partitioning():
    """Batch-sharded mesh: the pair kernel's custom-partitioning rule must
    keep both towers per-shard (no gather) with reference results + grads
    (same contract as the single kernel's test above in
    tests/test_fused_attention.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, La, Da, Ha = 16, 9, 128, 2
    Lb, Db, Hb = 12, 128, 2
    qa = _mk((B, La, 3 * Da), seed=5)
    qb = _mk((B, Lb, 3 * Db), seed=6)
    mb = jnp.triu(jnp.full((Lb, Lb), -1e30), 1).astype(jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qa_s, qb_s = jax.device_put(qa, sh), jax.device_put(qb, sh)

    @jax.jit
    def fwd(qa, qb):
        return fa.fused_attention_pair(qa, None, qb, mb, Ha, Hb, True)

    oa, ob = fwd(qa_s, qb_s)
    np.testing.assert_allclose(
        np.asarray(oa), np.asarray(fa.reference_attention(qa, None, Ha)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ob), np.asarray(fa.reference_attention(qb, mb, Hb)),
        atol=1e-5,
    )

    @jax.jit
    def loss(qa, qb):
        oa, ob = fa.fused_attention_pair(qa, None, qb, mb, Ha, Hb, True)
        return (oa ** 2).sum() + (ob ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1))(qa_s, qb_s)
    g_ref = jax.grad(
        lambda qa, qb: (fa.reference_attention(qa, None, Ha) ** 2).sum()
        + (fa.reference_attention(qb, mb, Hb) ** 2).sum(),
        argnums=(0, 1),
    )(qa, qb)
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-4)


def _tiny_zip_cfg(**over):
    # ViT-Test is the repo's tiny fixture arch; force equal-depth towers
    # with pair-supported head geometry (hd=64 -> 2 heads/group).
    return resolve_clip_cfg(
        "ViT-Test",
        vision_cfg={"image_size": 64, "patch_size": 32, "width": 128,
                    "layers": 2, "heads": 2},
        text_cfg={"context_length": 16, "vocab_size": 512, "width": 128,
                  "heads": 2, "layers": 2},
        embed_dim=32,
        **over,
    )


@pytest.mark.slow
def test_zip_towers_model_parity():
    cfg_off = _tiny_zip_cfg(zip_towers="off")
    cfg_on = _tiny_zip_cfg(zip_towers="on")
    m_off = CLIP(cfg=cfg_off)
    m_on = CLIP(cfg=cfg_on)
    images = _mk((8, 64, 64, 3), scale=1.0, seed=3)
    text = jnp.asarray(
        np.random.default_rng(4).integers(1, 512, (8, 16)), jnp.int32
    )
    params = m_off.init(jax.random.PRNGKey(0), images=images, text=text)

    out_off = m_off.apply(params, images=images, text=text)
    out_on = m_on.apply(params, images=images, text=text)
    for k in ("image_features", "text_features"):
        np.testing.assert_allclose(
            np.asarray(out_on[k]), np.asarray(out_off[k]), atol=1e-5
        )

    def loss(model, p):
        out = model.apply(p, images=images, text=text)
        logits = out["image_features"] @ out["text_features"].T
        labels = jnp.arange(8)
        return -jnp.mean(
            jax.nn.log_softmax(logits * out["logit_scale"])[labels, labels]
        )

    g_off = jax.grad(lambda p: loss(m_off, p))(params)
    g_on = jax.grad(lambda p: loss(m_on, p))(params)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    assert len(flat_off) == len(flat_on)
    for (pa, a), (pb, b) in zip(flat_on, flat_off):
        assert pa == pb
        scale = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=max(1e-5, 1e-4 * scale),
            err_msg=str(pa),
        )


def test_zip_ready_falls_back_on_exotic_blocks():
    # qk-norm is unsupported by the zip stages -> must not zip
    cfg = _tiny_zip_cfg(zip_towers="on")
    m = CLIP(cfg=cfg)
    assert m.bind(
        m.init(jax.random.PRNGKey(0),
               images=_mk((2, 64, 64, 3)),
               text=jnp.ones((2, 16), jnp.int32)),
    )._zip_ready()

    import dataclasses

    cfg_qk = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, qk_norm=True)
    )
    m2 = CLIP(cfg=cfg_qk)
    assert not m2.bind(
        m2.init(jax.random.PRNGKey(0),
                images=_mk((2, 64, 64, 3)),
                text=jnp.ones((2, 16), jnp.int32)),
    )._zip_ready()

    # unequal depth -> no zip
    cfg_d = dataclasses.replace(
        cfg, text_cfg=dataclasses.replace(cfg.text_cfg, layers=3)
    )
    m3 = CLIP(cfg=cfg_d)
    assert not m3.bind(
        m3.init(jax.random.PRNGKey(0),
                images=_mk((2, 64, 64, 3)),
                text=jnp.ones((2, 16), jnp.int32)),
    )._zip_ready()


# --- split-projection interface (fused_attention_split) ---------------------


@pytest.mark.parametrize("mask", [False, True])
def test_split_kernel_fwd_bwd_parity(mask):
    """fused_attention_split (separate q/k/v arrays, separate dq/dk/dv
    cotangents — no dqkv concat in the backward) must match the reference
    attention exactly, fwd and grads."""
    B, L, D, H = 8, 50, 128, 2
    q = _mk((B, L, D), seed=11)
    k = _mk((B, L, D), seed=12)
    v = _mk((B, L, D), seed=13)
    m = (jnp.triu(jnp.full((L, L), -1e30), 1).astype(jnp.float32)
         if mask else None)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    ref = fa.reference_attention(qkv, m, H)
    out = fa.fused_attention_split(q, k, v, m, H, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_split(q, k, v):
        o = fa.fused_attention_split(q, k, v, m, H, True)
        return (o * jnp.cos(o)).sum()

    def loss_ref(q, k, v):
        o = fa.reference_attention(jnp.concatenate([q, k, v], -1), m, H)
        return (o * jnp.cos(o)).sum()

    gs = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        denom = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) / denom < 1e-5


def test_split_model_parity_and_param_tree():
    """attn_impl='pallas_split' reuses the SAME stored (D, 3D) qkv weight
    (slice-GEMMs) — identical param tree and identical outputs to einsum."""
    cfg_a = resolve_clip_cfg("ViT-Test", attn_impl="einsum")
    cfg_b = resolve_clip_cfg("ViT-Test", attn_impl="pallas_split")
    ma, mb = CLIP(cfg=cfg_a), CLIP(cfg=cfg_b)
    imgs = _mk((4, 32, 32, 3), scale=1.0, seed=14)
    txt = jnp.asarray(
        np.random.default_rng(15).integers(1, 512, (4, 16)), jnp.int32
    )
    params = ma.init(jax.random.PRNGKey(0), images=imgs, text=txt)
    # same tree works for both impls (checkpoint compatibility)
    oa = ma.apply(params, images=imgs, text=txt)
    ob = mb.apply(params, images=imgs, text=txt)
    for kk in ("image_features", "text_features"):
        np.testing.assert_allclose(
            np.asarray(ob[kk]), np.asarray(oa[kk]), atol=1e-5
        )


def test_split_kernel_sharded_batch_partitioning():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, L, D, H = 16, 9, 128, 2
    q, k, v = (_mk((B, L, D), seed=s) for s in (21, 22, 23))
    m = jnp.triu(jnp.full((L, L), -1e30), 1).astype(jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))

    @jax.jit
    def fwd(q, k, v):
        return fa.fused_attention_split(q, k, v, m, H, True)

    out = fwd(qs, ks, vs)
    ref = fa.reference_attention(jnp.concatenate([q, k, v], -1), m, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @jax.jit
    def loss(q, k, v):
        return (fa.fused_attention_split(q, k, v, m, H, True) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(
        lambda q, k, v: (
            fa.reference_attention(jnp.concatenate([q, k, v], -1), m, H) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3,
                                   rtol=1e-4)
