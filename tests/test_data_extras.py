"""ImageFolder dataset, weighted resampling, zero-shot classification path."""
import numpy as np
import pytest
from PIL import Image

from spatial_clip_tpu.data.datasets.imagefolder import (
    ImageFolderDataset,
    collate_classification,
    get_imagenet_loader,
)
from spatial_clip_tpu.data.resampling import ResampledDataset, parse_weighted_spec


@pytest.fixture()
def image_folder(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ("cat", "dog", "fish"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    return tmp_path


def test_imagefolder_and_subsample(image_folder):
    ds = ImageFolderDataset(image_folder)
    assert len(ds) == 18
    assert ds.classes == ["cat", "dog", "fish"]
    sub = ImageFolderDataset(image_folder, max_per_class=2)
    assert len(sub) == 6
    item = sub[0]
    assert item["image"].shape == (8, 8, 3) and item["label"] == 0
    batch = collate_classification([sub[i] for i in range(4)])
    assert batch["images"].shape == (4, 8, 8, 3)
    assert batch["label"].dtype == np.int64


def test_zero_shot_eval_pipeline(image_folder, tiny_bundle):
    from spatial_clip_tpu.models.tokenizer import HashTokenizer
    from spatial_clip_tpu.train.zero_shot import (
        build_zero_shot_classifier,
        zero_shot_eval,
    )

    loader, classes = get_imagenet_loader(
        image_folder,
        preprocess_fn=lambda img: np.asarray(img.resize((32, 32)), dtype=np.uint8),
        batch_size=6,
    )
    tok = HashTokenizer(vocab_size=512, context_length=16)
    clf = build_zero_shot_classifier(
        tiny_bundle, tiny_bundle.params, tok, classes
    )
    assert clf.shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(clf, axis=0), 1.0, rtol=1e-5)
    metrics = zero_shot_eval(tiny_bundle, tiny_bundle.params, clf, loader)
    assert 0.0 <= metrics["top1"] <= metrics["top5"] <= 1.0


def test_parse_weighted_spec():
    paths, weights = parse_weighted_spec("a::2 b c::0.5")
    assert paths == ["a", "b", "c"]
    assert weights == [2.0, 1.0, 0.5]


def test_resampled_dataset_deterministic_and_weighted():
    ds_a = [{"src": "a", "i": i} for i in range(10)]
    ds_b = [{"src": "b", "i": i} for i in range(10)]
    mix = ResampledDataset([ds_a, ds_b], weights=[3.0, 1.0],
                           samples_per_epoch=400, seed=1)
    frac_a = sum(mix[i]["src"] == "a" for i in range(len(mix))) / len(mix)
    assert 0.68 < frac_a < 0.82  # ~0.75
    # deterministic per epoch, different across epochs
    mix.set_epoch(0)
    first = [mix[i]["i"] for i in range(20)]
    mix.set_epoch(0)
    assert [mix[i]["i"] for i in range(20)] == first
    mix.set_epoch(1)
    assert [mix[i]["i"] for i in range(20)] != first


def test_iterable_tar_dataset(tmp_path):
    """Streaming reader: brace expansion, sequential iteration, shuffle
    buffer, batching, corrupt-member tolerance."""
    import io as _io
    import tarfile as _tar

    from spatial_clip_tpu.data.datasets.iterable_shards import (
        IterableTarDataset,
        braceexpand,
        expand_shard_urls,
        iter_batches,
    )

    assert braceexpand("s-{00..02}.tar") == ["s-00.tar", "s-01.tar", "s-02.tar"]

    rng = np.random.default_rng(0)
    for shard in range(2):
        with _tar.open(tmp_path / f"shard-{shard:06d}.tar", "w") as tf:
            for i in range(6):
                key = f"{shard}_{i:04d}"
                img = Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
                b = _io.BytesIO()
                img.save(b, format="PNG")
                for ext, payload in (
                    ("png", b.getvalue()),
                    ("txt", f"G{i}".encode()),
                    ("json", b'{"sample_id": "s"}'),
                ):
                    info = _tar.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    tf.addfile(info, _io.BytesIO(payload))

    spec = str(tmp_path / "shard-{000000..000001}.tar")
    assert len(expand_shard_urls(spec)) == 2
    ds = IterableTarDataset(spec, shuffle_buffer=4, seed=0)
    samples = list(ds)
    assert len(samples) == 12
    assert samples[0]["image"].shape == (8, 8, 3)
    batches = list(iter_batches(ds, batch_size=5))
    assert len(batches) == 2  # drop-last
    assert batches[0]["images"].shape == (5, 8, 8, 3)
    # epoch changes ordering deterministically
    ds.set_epoch(0)
    a = [s["raw_text"] for s in ds]
    ds.set_epoch(0)
    assert [s["raw_text"] for s in ds] == a
