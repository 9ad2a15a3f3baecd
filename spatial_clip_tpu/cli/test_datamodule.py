"""Standalone datamodule smoke CLI (ref: src/test_datamodule.py:21-55):
instantiates the datamodule from the composed config with a dummy
preprocess/tokenizer and asserts batch shapes.

    python -m spatial_clip_tpu.cli.test_datamodule data=synthetic
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    from spatial_clip_tpu.config import compose, instantiate

    config_dir = Path(__file__).parents[2] / "configs"
    cfg = compose(config_dir, "train", list(argv if argv is not None else sys.argv[1:]))
    dm = instantiate(cfg["data"])
    dm.preprocess_fn = lambda img: np.asarray(img, dtype=np.uint8)
    dm.tokenizer = lambda texts: [np.ones(16, dtype=np.int32) for _ in texts]
    dm.prepare_data()
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    B = dm.batch_size
    k = dm.k_neighbors
    assert batch["images"].shape[0] == B, batch["images"].shape
    assert batch["neighbor_tile_ids"].shape == (B, k)
    assert batch["neighbor_alphas"].shape == (B, k)
    assert batch["image_tile_ids"].shape == (B,)
    print(
        f"datamodule ok: images {batch['images'].shape} texts {batch['texts'].shape} "
        f"neighbors {batch['neighbor_tile_ids'].shape}"
    )
    return batch


if __name__ == "__main__":
    main()
