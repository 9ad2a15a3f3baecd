#!/usr/bin/env python
"""Gene-MLP tower retrieval vs data scale (north-star config 1 evidence).

Round-1 finding (docs/experiments.md): the gene-MLP tower wins throughput
(1.29x target) but lags the text tower on synthetic retrieval at small data
scale (R@1 0.13 vs 0.50 @ 8k spots), with a positive scaling trend. This
study extends the curve to 32k/64k spots (plus a capacity arm) to test the
hypothesis that the gap closes with data — the deciding evidence for whether
one config can satisfy the whole north star (throughput AND retrieval).

    python scripts/gene_scaling_study.py --out reports/gene_scaling.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def run_arm(tower: str, spots: int, epochs: int, batch: int,
            gene_width: int = 256, gene_layers: int = 2, seed: int = 0,
            generator: str = "identity") -> dict:
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.data.datamodule import DataLoader
    from spatial_clip_tpu.data.datasets import SyntheticSpatialDataset
    from spatial_clip_tpu.data.datasets.synthetic import (
        SyntheticExpressionDataset,
        synthetic_gene_list,
    )
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.models.tokenizer import GeneTokenizer, GeneVectorizer
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    # 'linear' = bag-of-genes linear control tower (round-4 verdict #9):
    # the same rank-weighted gene vector through a 0-block GeneMLPTower
    # (Dense -> LN -> Dense, no nonlinearity). If the synthetic generator
    # leaked structure that trivially favors vector towers, this arm would
    # match the MLP; a large MLP-over-linear gap is the standard evidence
    # that the MLP is learning non-trivial compositional structure.
    if tower in ("gene", "linear"):
        tok = GeneVectorizer(synthetic_gene_list())
    else:
        tok = GeneTokenizer(synthetic_gene_list(), context_length=56)
    ds_cls = (SyntheticExpressionDataset if generator == "expression"
              else SyntheticSpatialDataset)
    train_ds = ds_cls(
        num_samples=spots, image_size=64, k_neighbors=6, sentence_len=50,
        tokenizer=tok, seed=seed,
    )
    val_ds = ds_cls(
        num_samples=512, image_size=64, k_neighbors=6, sentence_len=50,
        tokenizer=tok, seed=seed + 1,
    )
    vision = {"image_size": 64, "layers": 6, "width": 128, "patch_size": 16,
              "heads": 4}
    if tower in ("gene", "linear"):
        layers = 0 if tower == "linear" else gene_layers
        bundle = create_model(
            "ViT-Test", precision="bf16", seed=seed, embed_dim=128,
            vision_cfg=vision,
            gene_cfg={"num_genes": tok.num_genes, "width": gene_width,
                      "layers": layers},
        )
    else:
        bundle = create_model(
            "ViT-Test", precision="bf16", seed=seed, embed_dim=128,
            vision_cfg=vision,
            text_cfg={"context_length": 56, "vocab_size": tok.vocab_size,
                      "width": 128, "heads": 4, "layers": 4},
        )
    steps = max(1, spots * epochs // batch)
    trainer = Trainer(
        bundle, loss=make_loss("clip"),
        config=TrainerConfig(
            learning_rate=1e-3, warmup_steps=max(steps // 10, 1),
            total_steps=steps, augment=True, color_jitter=0.2,
            log_every=10**9, seed=seed,
        ),
    )
    loader = DataLoader(train_ds, batch_size=batch, shuffle=True, seed=seed,
                        drop_last=True)
    step = trainer.make_train_step()
    state = trainer.init_state()
    t0 = time.time()
    it = iter(loader)
    epoch = 0
    losses = []
    for s in range(steps):
        try:
            b = next(it)
        except StopIteration:
            epoch += 1
            loader.set_epoch(epoch)
            it = iter(loader)
            b = next(it)
        state, m = step(state, trainer._device_batch(b))
        if s % 200 == 0 or s == steps - 1:
            losses.append(round(float(np.asarray(m["loss"])), 4))
    elapsed = time.time() - t0
    val = trainer.evaluate(state, DataLoader(val_ds, batch_size=256, shuffle=False))
    out = {
        "tower": tower, "spots": spots, "steps": steps, "epochs": epochs,
        "generator": generator,
        "gene_width": gene_width if tower in ("gene", "linear") else None,
        "gene_layers": (0 if tower == "linear" else gene_layers)
        if tower in ("gene", "linear") else None,
        "train_loss_curve": losses,
        "val": {k: round(float(v), 4) for k, v in val.items()},
        "elapsed_sec": round(elapsed, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--generator", default="identity",
                    choices=("identity", "expression"))
    ap.add_argument("--arms", default=None,
                    help="comma list tower:spots[:width:layers], e.g. "
                         "'gene:65536,text:65536,gene:262144,text:262144'")
    ap.add_argument("--out", type=Path, default=Path("reports/gene_scaling.json"))
    args = ap.parse_args(argv)
    if args.arms:
        arms = []
        for spec in args.arms.split(","):
            parts = spec.strip().split(":")
            kw = {}
            if len(parts) >= 4:
                kw = {"gene_width": int(parts[2]), "gene_layers": int(parts[3])}
            arms.append((parts[0], int(parts[1]), kw))
    else:
        arms = [
            ("gene", 8192, {}),
            ("gene", 32768, {}),
            ("gene", 65536, {}),
            ("gene", 65536, {"gene_width": 512, "gene_layers": 3}),
            ("text", 8192, {}),
            ("text", 65536, {}),
        ]
    results = []
    for tower, spots, kw in arms:
        results.append(run_arm(tower, spots, args.epochs, args.batch,
                               generator=args.generator, **kw))
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
