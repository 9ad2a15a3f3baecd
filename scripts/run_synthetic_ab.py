#!/usr/bin/env python
"""Spatial-vs-standard-loss A/B on synthetic spatial data
(the runnable analogue of the reference's medium_spatial vs medium_normal
experiment pair, ref: docs/medium_dataset_experiments.md).

    python scripts/run_synthetic_ab.py --steps 300 --batch 128 --out reports/ab.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def run_arm(loss_name: str, steps: int, batch: int, seed: int = 0,
            tower: str = "text") -> dict:
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.data.datamodule import DataLoader
    from spatial_clip_tpu.data.datasets import SyntheticSpatialDataset
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.models.tokenizer import GeneTokenizer
    from spatial_clip_tpu.data.datasets.synthetic import synthetic_gene_list
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    if tower == "gene":
        from spatial_clip_tpu.models.tokenizer import GeneVectorizer

        tok = GeneVectorizer(synthetic_gene_list())
    else:
        tok = GeneTokenizer(synthetic_gene_list(), context_length=56)
    train_ds = SyntheticSpatialDataset(
        num_samples=2048, image_size=64, k_neighbors=6, sentence_len=50,
        tokenizer=tok, seed=seed,
    )
    val_ds = SyntheticSpatialDataset(
        num_samples=256, image_size=64, k_neighbors=6, sentence_len=50,
        tokenizer=tok, seed=seed + 1,
    )
    if tower == "gene":
        bundle = create_model(
            "ViT-Test", precision="bf16", seed=seed,
            embed_dim=128,
            vision_cfg={"image_size": 64, "layers": 6, "width": 128, "patch_size": 16, "heads": 4},
            gene_cfg={"num_genes": tok.num_genes, "width": 256, "layers": 2},
        )
    else:
        bundle = create_model(
            "ViT-Test", precision="bf16", seed=seed,
            embed_dim=128,
            vision_cfg={"image_size": 64, "layers": 6, "width": 128, "patch_size": 16, "heads": 4},
            text_cfg={"context_length": 56, "vocab_size": tok.vocab_size, "width": 128,
                      "heads": 4, "layers": 4},
        )
    loss = (
        make_loss("spatial", cap_logit_scale=50.0)
        if loss_name == "spatial"
        else make_loss("clip")
    )
    trainer = Trainer(
        bundle, loss=loss,
        config=TrainerConfig(
            learning_rate=1e-3, warmup_steps=max(steps // 10, 1),
            total_steps=steps, augment=True, color_jitter=0.2,
            log_every=10**9, seed=seed,
        ),
    )
    loader = DataLoader(train_ds, batch_size=batch, shuffle=True, seed=seed)
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
    val = trainer.evaluate(state, DataLoader(val_ds, batch_size=batch, shuffle=False))
    return {
        "loss_fn": loss_name,
        "tower": tower,
        "steps": steps,
        "train_loss_curve": losses,
        "val": {k: round(float(v), 4) for k, v in val.items()},
        "elapsed_sec": round(elapsed, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", type=Path, default=Path("reports/synthetic_ab.json"))
    args = ap.parse_args(argv)
    results = [run_arm("clip", args.steps, args.batch),
               run_arm("spatial", args.steps, args.batch),
               run_arm("clip", args.steps, args.batch, tower="gene"),
               run_arm("spatial", args.steps, args.batch, tower="gene")]
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
