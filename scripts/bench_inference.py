#!/usr/bin/env python
"""Serving-path throughput: tile/text encoding on one chip.

Measures the jitted inference encoders (on-device uint8 normalize + tower +
projection + L2-norm) for the deployment configurations:

- bf16 dense (the training configuration's precision)
- int8 MLP serving path (``mlp_impl='int8'`` — per-row dynamic activation
  quant x per-channel int8 weights through the MXU int8 rate;
  models/quantize.py)

    python scripts/bench_inference.py --batch 256 --out reports/bench_infer.json

Value-fetch sync over chained back-pressured batches (CLAUDE.md timing
rules). Ref analogue: the reference serves embeddings through the same
torch modules it trains; this is the TPU-native serving surface.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def bench_encoder(fn, args, steps=40, warmup=5):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--out", default="reports/bench_infer.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.models.quantize import convert_tree_mlp_int8
    from spatial_clip_tpu.models.transforms import normalize_batch

    rng = np.random.default_rng(0)
    results = {}
    bundle = create_model(args.model, precision="bf16", seed=0)
    size = bundle.cfg.vision_cfg.image_size
    images = rng.integers(0, 255, (args.batch, size, size, 3), dtype=np.uint8)
    texts = rng.integers(
        0, bundle.cfg.text_cfg.vocab_size,
        (args.batch, bundle.cfg.text_cfg.context_length), dtype=np.int32,
    )

    def build(mlp_impl):
        b = (bundle if mlp_impl == "dense"
             else create_model(args.model, precision="bf16", seed=0,
                               mlp_impl="int8"))
        params = (b.params if mlp_impl == "dense"
                  else convert_tree_mlp_int8(bundle.params))

        @jax.jit
        def enc_img(p, u8):
            x = normalize_batch(u8, dtype=jnp.bfloat16)
            return b.model.apply({"params": p}, x,
                                 method=b.model.encode_image)

        @jax.jit
        def enc_txt(p, t):
            return b.model.apply({"params": p}, t,
                                 method=b.model.encode_text)

        return params, enc_img, enc_txt

    # device-resident inputs: the steady-state serving measurement must not
    # count host->device transfer of the benchmark batch on every call
    # (through the remote tunnel that dominates everything)
    images_d = jax.device_put(images)
    texts_d = jax.device_put(texts)
    for impl in ("dense", "int8"):
        try:
            params, enc_img, enc_txt = build(impl)
            params = jax.device_put(params)
            t_img = bench_encoder(enc_img, (params, images_d), args.steps)
            t_txt = bench_encoder(enc_txt, (params, texts_d), args.steps)
            results[impl] = {
                "image_tiles_per_sec": round(args.batch / t_img, 1),
                "image_ms_per_batch": round(t_img * 1e3, 2),
                "text_per_sec": round(args.batch / t_txt, 1),
                "text_ms_per_batch": round(t_txt * 1e3, 2),
            }
            print(impl, json.dumps(results[impl]), flush=True)
        except Exception as e:  # pragma: no cover - report and continue
            results[impl] = {"error": str(e)[:300]}
            print(impl, "FAILED:", str(e)[:200], flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
