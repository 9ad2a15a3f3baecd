"""Class-folder image dataset for zero-shot classification eval
(ref: open_clip_train/data.py:118-161 ``get_imagenet`` — incl. the
50-images-per-class validation subsample).

Layout: ``root/<class_name>/*.{jpg,png,jpeg}``; label ids follow sorted
class-name order. Batches carry ``images`` + ``label`` (consumed by
train/zero_shot.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import numpy as np
from PIL import Image

_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class ImageFolderDataset:
    def __init__(
        self,
        root: Union[str, Path],
        preprocess_fn: Optional[Callable] = None,
        max_per_class: Optional[int] = None,
        seed: int = 0,
    ):
        self.root = Path(root)
        self.preprocess_fn = preprocess_fn
        names = [d.name for d in self.root.iterdir() if d.is_dir()]
        # ImageNetV2 ships numeric class dirs ("0".."999"): sort numerically
        # so label ids align with the vendored metadata order
        # (ref: open_clip_train/data.py:125 ImageNetV2Dataset)
        self.classes = (
            sorted(names, key=int) if names and all(n.isdigit() for n in names)
            else sorted(names)
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        rng = np.random.default_rng(seed)
        self.items: List = []
        for c in self.classes:
            files = sorted(
                p for p in (self.root / c).iterdir() if p.suffix.lower() in _EXTS
            )
            if max_per_class is not None and len(files) > max_per_class:
                # deterministic per-class subsample (ref: data.py:131-149)
                keep = rng.permutation(len(files))[:max_per_class]
                files = [files[i] for i in sorted(keep)]
            self.items.extend((p, self.class_to_idx[c]) for p in files)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        path, label = self.items[idx]
        img = Image.open(path).convert("RGB")
        image = self.preprocess_fn(img) if self.preprocess_fn else np.asarray(img)
        return {"image": image, "label": int(label)}


def collate_classification(items: List[Dict]) -> Dict[str, np.ndarray]:
    return {
        "images": np.stack([np.asarray(it["image"]) for it in items]),
        "label": np.asarray([it["label"] for it in items], dtype=np.int64),
    }


def get_imagenet_loader(
    root: Union[str, Path],
    preprocess_fn: Callable,
    batch_size: int = 64,
    max_per_class: Optional[int] = 50,
    num_workers: int = 0,
):
    """Validation loader matching the reference's v2/val handling."""
    from spatial_clip_tpu.data.datamodule import DataLoader

    ds = ImageFolderDataset(root, preprocess_fn, max_per_class=max_per_class)
    return (
        DataLoader(
            ds, batch_size=batch_size, shuffle=False, drop_last=False,
            num_workers=num_workers, collate_fn=collate_classification,
        ),
        ds.classes,
    )
