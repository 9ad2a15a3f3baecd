"""Batch embedding export: encode a whole dataset with a trained model.

The production inference path (the reference precomputes OmiCLIP embeddings
in spaglam, ref: dataset_writer.py precompute_embeddings, and its eval flows
re-embed per run): encodes every tile and gene sentence of a dataset split
to L2-normalized vectors, saved as .npz (+ optional parquet) keyed by tile id
— ready for retrieval indexes or downstream probing.

    python -m spatial_clip_tpu.cli.embed --model ViT-B-32 \
        --ckpt logs/run/checkpoints --data /data/processed/hest_v1 \
        --dataset-type shards --split train --out embeddings.npz
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from spatial_clip_tpu.data.datamodule import DataLoader
    from spatial_clip_tpu.data.datasets import create_spatial_dataset
    from spatial_clip_tpu.models.clip import CLIP
    from spatial_clip_tpu.models.factory import (
        create_model_and_transforms,
        get_tokenizer,
        load_checkpoint,
    )
    from spatial_clip_tpu.models.transforms import normalize_batch

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--data", required=True)
    ap.add_argument("--dataset-type", default="shards",
                    choices=["shards", "parquet", "synthetic", "csv"])
    ap.add_argument("--split", default="train")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--k-neighbors", type=int, default=1)
    ap.add_argument("--gene-vocab", default=None)
    ap.add_argument("--out", default="embeddings.npz")
    ap.add_argument("--parquet", action="store_true", help="also write .parquet")
    args = ap.parse_args(argv)

    bundle, _, pp_val = create_model_and_transforms(
        args.model, precision=args.precision
    )
    params = bundle.params
    if args.ckpt:
        p = Path(args.ckpt)
        if p.is_dir() and any(p.glob("step_*")):
            from spatial_clip_tpu.train.checkpoints import CheckpointManager
            from spatial_clip_tpu.train.loop import TrainState

            mgr = CheckpointManager(str(p))
            import optax

            target = {"step": np.zeros((), np.int32), "params": params}
            # restore params-only from the state file
            state_bytes = (p / f"step_{mgr.latest_step()}" / "state.msgpack").read_bytes()
            from flax import serialization

            full = serialization.msgpack_restore(state_bytes)
            params = serialization.from_state_dict(params, full["params"])
        else:
            params = load_checkpoint(params, args.ckpt, bundle.model_name)
    params = jax.device_put(params)

    tokenizer = get_tokenizer(bundle.model_name, gene_vocab=args.gene_vocab)
    fmt = {"shards": "shards_v1", "parquet": "parquet_v1"}.get(
        args.dataset_type, args.dataset_type
    )
    ds = create_spatial_dataset(
        format_name=fmt, data_dir=Path(args.data), split_name=args.split,
        split_spec=args.split, k_neighbors=args.k_neighbors,
        preprocess_fn=pp_val, tokenizer=tokenizer,
    )
    loader = DataLoader(
        ds, batch_size=args.batch_size, shuffle=False, drop_last=False,
        num_workers=args.workers,
    )

    model = bundle.model
    enc_i = jax.jit(lambda p, x: model.apply({"params": p}, x, True, method=CLIP.encode_image))
    enc_t = jax.jit(lambda p, t: model.apply({"params": p}, t, True, method=CLIP.encode_text))

    tile_ids, img_out, txt_out = [], [], []
    t0 = time.time()
    n = 0
    for batch in loader:
        images = batch["images"]
        if images.dtype == np.uint8:
            images = normalize_batch(jnp.asarray(images), dtype=model.dtype)
        B = len(batch["image_tile_ids"])
        pad = (-B) % args.batch_size
        if pad:  # static shapes: pad the final partial batch
            images = jnp.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)))
            texts = np.pad(batch["texts"], ((0, pad), (0, 0)))
        else:
            texts = batch["texts"]
        img_out.append(np.asarray(enc_i(params, images))[:B])
        txt_out.append(np.asarray(enc_t(params, jnp.asarray(texts)))[:B])
        tile_ids.append(np.asarray(batch["image_tile_ids"]))
        n += B
    elapsed = time.time() - t0
    tile_ids = np.concatenate(tile_ids)
    img_emb = np.concatenate(img_out)
    txt_emb = np.concatenate(txt_out)
    np.savez(
        args.out, tile_ids=tile_ids, image_embeddings=img_emb,
        text_embeddings=txt_emb,
    )
    if args.parquet:
        import pandas as pd

        df = pd.DataFrame({
            "tile_id": tile_ids,
            "image_embedding": list(img_emb.astype(np.float32)),
            "text_embedding": list(txt_emb.astype(np.float32)),
        })
        df.to_parquet(Path(args.out).with_suffix(".parquet"))
    stats = {
        "n": int(n), "dim": int(img_emb.shape[1]),
        "pairs_per_sec": round(n / max(elapsed, 1e-9), 1), "out": args.out,
    }
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main(sys.argv[1:])
