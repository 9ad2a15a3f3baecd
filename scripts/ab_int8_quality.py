#!/usr/bin/env python
"""Quality gate for int8-forward training GEMMs (ops/int8_train,
transformer.INT8_GEMM).

Trains the synthetic learnable-correspondence model with identical
seeds/data — bf16 forward (shipped default) vs int8 forward with STE
backward — and compares the loss trajectory and final retrieval metrics,
exactly like the nu-bf16 Adam gate (reports/ab_nu.json pattern). The tiny
model's widths (128/384/512/768) are all %128, so EVERY projection
(patchify, qkv, out, MLP, and the towers' inner Dense calls) runs the int8
path — the gate exercises the full quantized surface.

    python scripts/ab_int8_quality.py --steps 400 --batch 128 \
        --out reports/ab_int8_quality.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def run_arm(int8: bool, steps: int, batch: int, seed: int = 0) -> dict:
    import spatial_clip_tpu.models.transformer as tfm

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.data.datamodule import DataLoader
    from spatial_clip_tpu.data.datasets import SyntheticSpatialDataset
    from spatial_clip_tpu.data.datasets.synthetic import synthetic_gene_list
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.models.tokenizer import GeneTokenizer
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    tfm.INT8_GEMM = int8
    try:
        tok = GeneTokenizer(synthetic_gene_list(), context_length=56)
        train_ds = SyntheticSpatialDataset(
            num_samples=4096, image_size=64, k_neighbors=6, sentence_len=50,
            tokenizer=tok, seed=seed,
        )
        val_ds = SyntheticSpatialDataset(
            num_samples=256, image_size=64, k_neighbors=6, sentence_len=50,
            tokenizer=tok, seed=seed + 1,
        )
        bundle = create_model(
            "ViT-Test", precision="bf16", seed=seed,
            embed_dim=128,
            vision_cfg={"image_size": 64, "layers": 6, "width": 128,
                        "patch_size": 16, "heads": 4},
            text_cfg={"context_length": 56, "vocab_size": tok.vocab_size,
                      "width": 128, "heads": 4, "layers": 4},
        )
        trainer = Trainer(
            bundle, loss=make_loss("spatial", cap_logit_scale=50.0),
            config=TrainerConfig(
                learning_rate=1e-3, warmup_steps=max(steps // 10, 1),
                total_steps=steps, augment=True, color_jitter=0.2,
                log_every=10**9, seed=seed,
            ),
        )
        loader = DataLoader(train_ds, batch_size=batch, shuffle=True,
                            seed=seed)
        step = trainer.make_train_step()
        state = trainer.init_state()
        t0 = time.time()
        it = iter(loader)
        losses = []
        for s in range(steps):
            try:
                b = next(it)
            except StopIteration:
                loader.set_epoch(s)
                it = iter(loader)
                b = next(it)
            state, m = step(state, trainer._device_batch(b))
            if s % 50 == 0 or s == steps - 1:
                losses.append(round(float(np.asarray(m["loss"])), 4))
        elapsed = time.time() - t0
        val = trainer.evaluate(state, DataLoader(val_ds, batch_size=batch,
                                                 shuffle=False))
        return {
            "forward": "int8" if int8 else "bf16",
            "seed": seed,
            "steps": steps,
            "train_loss_curve": losses,
            "val": {k: round(float(v), 4) for k, v in val.items()},
            "elapsed_sec": round(elapsed, 1),
        }
    finally:
        tfm.INT8_GEMM = False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--out", type=Path,
                    default=Path("reports/ab_int8_quality.json"))
    args = ap.parse_args(argv)
    results = []
    for seed in range(args.seeds):
        results.append(run_arm(False, args.steps, args.batch, seed=seed))
        results.append(run_arm(True, args.steps, args.batch, seed=seed))
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
