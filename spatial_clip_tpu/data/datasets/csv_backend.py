"""CSV image/caption dataset (ref: open_clip_train/data.py:29-47 CsvDataset).

Rows: image path + caption columns (default tab-separated, columns
``filepath``/``title``). No spatial neighbors (padded -1/0.0) so it plugs
into the same collate/loss machinery with the plain CLIP loss.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Union

import numpy as np
import pandas as pd
from PIL import Image


class CsvDataset:
    def __init__(
        self,
        input_filename: Union[str, Path],
        preprocess_fn: Optional[Callable] = None,
        tokenizer: Optional[Callable] = None,
        img_key: str = "filepath",
        caption_key: str = "title",
        sep: str = "\t",
        k_neighbors: int = 0,
    ):
        df = pd.read_csv(input_filename, sep=sep)
        self.images = df[img_key].astype(str).tolist()
        self.captions = df[caption_key].astype(str).tolist()
        self.root = Path(input_filename).parent
        self.preprocess_fn = preprocess_fn
        self.tokenizer = tokenizer
        self.k_neighbors = max(k_neighbors, 1)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int) -> dict:
        path = Path(self.images[idx])
        if not path.is_absolute():
            path = self.root / path
        img = Image.open(path).convert("RGB")
        image = self.preprocess_fn(img) if self.preprocess_fn else np.asarray(img)
        caption = self.captions[idx]
        text = (
            np.asarray(self.tokenizer([caption])[0])
            if self.tokenizer
            else np.zeros(8, dtype=np.int32)
        )
        return {
            "image": image,
            "text": text,
            "raw_text": caption,
            "anchor_tile_id": idx,
            "neighbor_tile_ids": [-1] * self.k_neighbors,
            "neighbor_alphas": [0.0] * self.k_neighbors,
        }
