"""ImageNet zero-shot: vendored metadata + runnable end-to-end eval.

Ref: src/open_clip/zero_shot_metadata.py (classnames/templates data assets),
open_clip_train/zero_shot.py:45-86, main.py --imagenet-val path.
"""
from __future__ import annotations

import numpy as np
import pytest

from spatial_clip_tpu.train.zero_shot import (
    imagenet_zero_shot_eval,
    load_imagenet_metadata,
)


def test_metadata_complete():
    names, templates = load_imagenet_metadata("openai")
    assert len(names) == 1000
    assert len(templates) == 80
    assert names[0] == "tench" and names[1] == "goldfish"
    assert templates[0]("dog") == "a bad photo of a dog."
    _, simple = load_imagenet_metadata("simple")
    assert len(simple) == 7


def _make_imagefolder(root, classes, per_class=2, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in classes:
        d = root / c
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")


def test_imagenet_zero_shot_end_to_end(tmp_path, tiny_bundle):
    from spatial_clip_tpu.data.datasets.imagefolder import get_imagenet_loader
    from spatial_clip_tpu.models.factory import get_tokenizer
    from spatial_clip_tpu.models.transforms import image_transform

    classes = ["tench", "goldfish", "hammerhead"]
    _make_imagefolder(tmp_path, classes)
    pp = image_transform(32, is_train=False)
    loader, found = get_imagenet_loader(tmp_path, pp, batch_size=4)
    assert sorted(found) == sorted(classes)
    tok = get_tokenizer("ViT-Test")
    res = imagenet_zero_shot_eval(
        tiny_bundle, tiny_bundle.params, tok, loader,
        template_set="simple", classnames=found,
    )
    assert 0.0 <= res["imagenet-zeroshot-val-top1"] <= 1.0
    assert res["imagenet-zeroshot-val-top5"] == 1.0  # top5 of 3 classes


def test_cli_imagenet_val_flag(tmp_path):
    from spatial_clip_tpu.cli import main_train

    classes = ["tench", "goldfish"]
    _make_imagefolder(tmp_path / "inval", classes)
    metrics = main_train.main(
        [
            "--model", "ViT-Test", "--precision", "fp32",
            "--dataset-type", "synthetic",
            "--synthetic-num-samples", "32", "--synthetic-image-size", "32",
            "--batch-size", "8", "--epochs", "1", "--steps-per-epoch", "1",
            "--warmup", "1", "--logs", str(tmp_path / "logs"), "--name", "z",
            "--imagenet-val", str(tmp_path / "inval"),
            "--zeroshot-templates", "simple",
        ]
    )
    assert "imagenet-zeroshot-val-top1" in metrics
    assert 0.0 <= metrics["imagenet-zeroshot-val-top1"] <= 1.0
