#!/usr/bin/env python
"""Pre/post-refactor equivalence harness for transformer.py setup() port.

    python scripts/_refactor_check.py capture /tmp/pre.npz
    python scripts/_refactor_check.py compare /tmp/pre.npz
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spatial_clip_tpu.models import transformer as T  # noqa: E402


def cases():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)
    img96 = jnp.asarray(rng.standard_normal((2, 96, 96, 3)), jnp.float32)
    txt = jnp.asarray(rng.integers(1, 1000, (2, 77)), jnp.int32)
    out = {}
    out["vit_base"] = (
        T.VisionTransformer(image_size=224, patch_size=32, width=128,
                            layers=2, heads=2, output_dim=64), (img,))
    out["vit_qknorm_ls"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, qk_norm=True,
                            ls_init_value=1e-4), (img96,))
    out["vit_cosine"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, scaled_cosine=True),
        (img96,))
    out["vit_attnpool"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, attentional_pool=True,
                            attn_pooler_queries=4, attn_pooler_heads=2),
        (img96,))
    out["vit_sincos_avg"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, pos_embed_type="sin_cos_2d",
                            pool_type="avg", final_ln_after_pool=True,
                            no_ln_pre=True, patchify_impl="conv"), (img96,))
    out["vit_tokens"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, output_tokens=True),
        (img96,))
    out["vit_remat"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, remat=True), (img96,))
    out["vit_xla_impl"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, attn_impl="xla"), (img96,))
    out["vit_fold"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, attn_impl="fold"), (img96,))
    out["vit_pallas_interp"] = (
        T.VisionTransformer(image_size=96, patch_size=32, width=128, layers=2,
                            heads=2, output_dim=64, attn_impl="pallas"),
        (img96,))
    out["txt_base"] = (
        T.TextTransformer(width=128, heads=2, layers=2, output_dim=64,
                          vocab_size=1000), (txt,))
    out["txt_cls_lastln"] = (
        T.TextTransformer(width=128, heads=2, layers=2, output_dim=64,
                          vocab_size=1000, embed_cls=True), (txt,))
    out["txt_projbias_avg"] = (
        T.TextTransformer(width=128, heads=2, layers=2, output_dim=64,
                          vocab_size=1000, proj_bias=True, pool_type="avg",
                          final_ln_after_pool=True, no_causal_mask=True),
        (txt,))
    out["txt_lngemm"] = (
        T.TextTransformer(width=128, heads=2, layers=2, output_dim=64,
                          vocab_size=1000, ln_gemm_impl="pallas"), (txt,))
    return out


def run_all():
    res = {}
    for name, (mod, args) in cases().items():
        params = mod.init(jax.random.PRNGKey(0), *args)
        y = mod.apply(params, *args)
        leaves = jax.tree_util.tree_leaves_with_path(params)
        for p, v in leaves:
            key = name + "::" + jax.tree_util.keystr(p)
            res[key] = np.asarray(v)
        if isinstance(y, tuple):
            for i, t in enumerate(y):
                res[name + f"::OUT{i}"] = np.asarray(t)
        else:
            res[name + "::OUT"] = np.asarray(y)
        print(f"{name}: {len(leaves)} params, out captured")
    return res


def main():
    mode, path = sys.argv[1], sys.argv[2]
    if mode == "capture":
        np.savez(path, **run_all())
        print("saved", path)
        return
    ref = dict(np.load(path))
    now = run_all()
    missing = sorted(set(ref) - set(now))
    extra = sorted(set(now) - set(ref))
    bad = []
    for k in sorted(set(ref) & set(now)):
        a, b = ref[k], now[k]
        if a.shape != b.shape or not np.array_equal(a, b):
            d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max() \
                if a.shape == b.shape else "shape"
            bad.append((k, d))
    print(f"missing={len(missing)} extra={len(extra)} diff={len(bad)}")
    for k in missing[:10]:
        print("  MISSING", k)
    for k in extra[:10]:
        print("  EXTRA", k)
    for k, d in bad[:10]:
        print("  DIFF", k, d)
    sys.exit(1 if (missing or extra or bad) else 0)


if __name__ == "__main__":
    main()
