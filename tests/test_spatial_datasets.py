"""Dataset backend contract tests (ported contract from the reference's
tests/test_spatial_datasets.py:1-135, numpy-native)."""
import json
import tarfile
from io import BytesIO
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from spatial_clip_tpu.data.datamodule import SpatialClipDataModule, collate_spatial
from spatial_clip_tpu.data.datasets import (
    ParquetSpatialDataset,
    ShardedSpatialDataset,
    SyntheticSpatialDataset,
    create_spatial_dataset,
)


class _DummyTokenizer:
    def __call__(self, texts):
        return [np.ones(8, dtype=np.int32) for _ in texts]


def _dummy_preprocess(image):
    return np.array(image, dtype=np.float32).transpose(2, 0, 1)


def _write_png(path: Path, color: int) -> None:
    Image.new("RGB", (4, 4), color=(color, color, color)).save(path)


def _make_parquet_split(tmp_path: Path) -> Path:
    split_dir = tmp_path / "train"
    split_dir.mkdir(parents=True)
    img0, img1 = split_dir / "img0.png", split_dir / "img1.png"
    _write_png(img0, 10)
    _write_png(img1, 20)
    pd.DataFrame(
        {
            "tile_id": [1, 2],
            "image_path": [str(img0), str(img1)],
            "gene_sentence": ["gene A", "gene B"],
        }
    ).to_parquet(split_dir / "nodes.parquet")
    pd.DataFrame(
        {
            "src_tile_id": [1, 1, 2],
            "nbr_tile_id": [1, 2, 1],
            "alpha": [0.6, 0.4, 1.0],
        }
    ).to_parquet(split_dir / "edges.parquet")
    return split_dir


def _make_shard_dataset(tmp_path: Path) -> Path:
    dataset_root = tmp_path / "processed"
    sample_dir = dataset_root / "SAMPLE_A"
    sample_dir.mkdir(parents=True, exist_ok=True)
    tar_path = sample_dir / "SAMPLE_A_000000.tar"
    with tarfile.open(tar_path, "w") as tar:
        for idx in range(3):
            base = f"SAMPLE_A_{idx:03d}"
            image = Image.new("RGB", (4, 4), color=(idx * 20, 0, 0))
            buf = BytesIO()
            image.save(buf, format="PNG")
            payloads = (
                ("png", buf.getvalue()),
                ("txt", f"spot {idx}".encode()),
                ("json", json.dumps({"sample_id": "SAMPLE_A", "x": idx * 5, "y": idx * 7}).encode()),
            )
            for ext, payload in payloads:
                info = tarfile.TarInfo(name=f"{base}.{ext}")
                info.size = len(payload)
                tar.addfile(info, BytesIO(payload))
    return dataset_root


def test_parquet_dataset_roundtrip(tmp_path):
    split_dir = _make_parquet_split(tmp_path)
    dataset = ParquetSpatialDataset(
        data_path=split_dir,
        k_neighbors=2,
        preprocess_fn=_dummy_preprocess,
        tokenizer=_DummyTokenizer(),
    )
    sample = dataset[0]
    assert sample["image"].shape[0] == 3
    assert len(sample["neighbor_tile_ids"]) == 2
    # top-k by alpha: tile 1's best neighbor is tile 1 (alpha .6) then 2 (.4)
    assert sample["neighbor_tile_ids"] == [1, 2]
    assert sample["neighbor_alphas"][0] == pytest.approx(0.6)


def test_sharded_dataset(tmp_path):
    dataset_root = _make_shard_dataset(tmp_path)
    dataset = ShardedSpatialDataset(
        dataset_root=dataset_root,
        split="train",
        sample_ids=["SAMPLE_A"],
        k_neighbors=2,
        preprocess_fn=_dummy_preprocess,
        tokenizer=_DummyTokenizer(),
        cache_dir=dataset_root / ".cache",
        rebuild_cache=True,
    )
    assert len(dataset) == 3
    sample = dataset[0]
    assert sample["image"].shape[-1] == 4
    assert len(sample["neighbor_tile_ids"]) == 2
    # nearest spot to idx0 (0,0) is idx1 (5,7) with alpha 1.0
    assert sample["neighbor_tile_ids"][0] == 1
    assert sample["neighbor_alphas"][0] == pytest.approx(1.0)
    assert sample["raw_text"] == "spot 0"
    # cache reuse path
    again = ShardedSpatialDataset(
        dataset_root=dataset_root, split="train", sample_ids=["SAMPLE_A"],
        k_neighbors=2, preprocess_fn=_dummy_preprocess, tokenizer=_DummyTokenizer(),
        cache_dir=dataset_root / ".cache", rebuild_cache=False,
    )
    np.testing.assert_array_equal(
        again._graph["ids"], dataset._graph["ids"]
    )


def test_factory_creates_correct_backend(tmp_path):
    split_dir = _make_parquet_split(tmp_path)
    dataset = create_spatial_dataset(
        format_name="parquet_v1",
        data_dir=split_dir.parent,
        split_name="train",
        split_spec="train",
        k_neighbors=1,
        preprocess_fn=_dummy_preprocess,
        tokenizer=_DummyTokenizer(),
    )
    assert isinstance(dataset, ParquetSpatialDataset)


def test_factory_creates_sharded_backend(tmp_path):
    dataset_root = _make_shard_dataset(tmp_path)
    dataset = create_spatial_dataset(
        format_name="shards_v1",
        data_dir=dataset_root,
        split_name="train",
        split_spec=["SAMPLE_A"],
        k_neighbors=1,
        preprocess_fn=_dummy_preprocess,
        tokenizer=_DummyTokenizer(),
        format_kwargs={"cache_dir": dataset_root / ".cache", "rebuild_cache": True},
    )
    assert isinstance(dataset, ShardedSpatialDataset)


def test_synthetic_dataset_and_collate():
    ds = SyntheticSpatialDataset(num_samples=16, image_size=8, k_neighbors=4)
    batch = collate_spatial([ds[i] for i in range(8)])
    assert batch["images"].shape == (8, 8, 8, 3)
    assert batch["neighbor_tile_ids"].shape == (8, 4)
    assert batch["neighbor_alphas"].dtype == np.float32
    # neighbors reference in-range tile ids or -1 padding
    nbr = batch["neighbor_tile_ids"]
    assert ((nbr >= -1) & (nbr < 16)).all()


def test_datamodule_handshake_and_batches(tmp_path):
    dm = SpatialClipDataModule(
        data_dir=str(tmp_path),
        k_neighbors=3,
        batch_size=4,
        dataset_format="synthetic",
        dataset_format_kwargs={"num_samples": 12, "image_size": 8},
    )
    with pytest.raises(ValueError):
        dm.setup("fit")  # handshake not done (ref: spatial_datamodule.py:79-80)
    dm.preprocess_fn = lambda img: np.asarray(img, dtype=np.uint8)
    dm.tokenizer = _DummyTokenizer()
    dm.prepare_data()
    dm.setup("fit")
    loader = dm.train_dataloader()
    batches = list(loader)
    assert len(batches) == 3  # drop_last
    b = batches[0]
    assert b["images"].shape == (4, 8, 8, 3)
    assert b["texts"].shape == (4, 8)
    assert b["image_tile_ids"].shape == (4,)
    assert b["neighbor_tile_ids"].shape == (4, 3)
    # deterministic epoch shuffling
    loader.set_epoch(0)
    first = next(iter(loader))["image_tile_ids"]
    loader.set_epoch(0)
    second = next(iter(loader))["image_tile_ids"]
    np.testing.assert_array_equal(first, second)
    loader.set_epoch(1)
    third = next(iter(loader))["image_tile_ids"]
    assert not np.array_equal(first, third)


def test_threaded_loader_matches_sync(tmp_path):
    ds = SyntheticSpatialDataset(num_samples=16, image_size=8, k_neighbors=2)
    from spatial_clip_tpu.data.datamodule import DataLoader

    sync = list(DataLoader(ds, batch_size=4, shuffle=False, num_workers=0))
    threaded = list(DataLoader(ds, batch_size=4, shuffle=False, num_workers=2))
    assert len(sync) == len(threaded)
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["image_tile_ids"], b["image_tile_ids"])


def test_process_worker_rng_diversity():
    """each pool worker must get a distinct augmentation stream (and a new
    epoch a new one) — identical forked/spawned RNG copies would replay the
    same crops in every worker."""
    import multiprocessing

    from spatial_clip_tpu.data.datamodule import _init_worker_dataset
    from spatial_clip_tpu.models.transforms import image_transform

    class DS:
        preprocess_fn = image_transform(8, is_train=True, seed=0)

    ctx = multiprocessing.get_context("spawn")
    counter = ctx.Value("i", 0)
    ds = DS()
    _init_worker_dataset(ds, counter, seed_base=100)
    a = ds.preprocess_fn.rng.integers(0, 2**31, 4).tolist()
    _init_worker_dataset(ds, counter, seed_base=100)   # "worker 1"
    b = ds.preprocess_fn.rng.integers(0, 2**31, 4).tolist()
    _init_worker_dataset(ds, ctx.Value("i", 0), seed_base=200)  # next epoch
    c = ds.preprocess_fn.rng.integers(0, 2**31, 4).tolist()
    assert a != b and a != c and b != c


def test_process_loader_matches_sync(tmp_path):
    """process pool workers (torch-DataLoader analogue): the dataset pickles
    into each worker once, items return identical to the sync path."""
    ds = SyntheticSpatialDataset(num_samples=16, image_size=8, k_neighbors=2)
    from spatial_clip_tpu.data.datamodule import DataLoader

    sync = list(DataLoader(ds, batch_size=4, shuffle=False, num_workers=0))
    proc = list(DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                           worker_type="process"))
    assert len(sync) == len(proc)
    for a, b in zip(sync, proc):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["image_tile_ids"], b["image_tile_ids"])


def test_process_loader_real_shard_dataset(tmp_path):
    """the FULL production item path (tar seek + PNG decode + transform +
    tokenizer) must survive pickling into spawn workers."""
    from spatial_clip_tpu.data.datamodule import DataLoader
    from spatial_clip_tpu.models.factory import get_tokenizer
    from spatial_clip_tpu.models.transforms import image_transform

    root = _make_shard_dataset(tmp_path)
    ds = ShardedSpatialDataset(
        dataset_root=root, split="train", sample_ids=["SAMPLE_A"],
        k_neighbors=2,
        preprocess_fn=image_transform(4, is_train=False),
        tokenizer=get_tokenizer("ViT-Test"),
        cache_dir=root / ".cache", rebuild_cache=True,
    )
    sync = list(DataLoader(ds, batch_size=3, shuffle=False, num_workers=0,
                           drop_last=False))
    proc = list(DataLoader(ds, batch_size=3, shuffle=False, num_workers=2,
                           drop_last=False, worker_type="process"))
    assert len(sync) == len(proc) == 1
    np.testing.assert_array_equal(sync[0]["images"], proc[0]["images"])
    np.testing.assert_array_equal(sync[0]["texts"], proc[0]["texts"])


def test_native_tar_indexer_matches_tarfile(tmp_path):
    """C++ indexer (native/tarindex.cpp) must agree with Python tarfile."""
    import tarfile as tf_mod

    from spatial_clip_tpu.data.datasets._native import get_lib, index_tar_native

    if get_lib() is None:
        pytest.skip("native library not built")
    dataset_root = _make_shard_dataset(tmp_path)
    tar_path = next(dataset_root.rglob("*.tar"))
    native = index_tar_native(str(tar_path))
    with tf_mod.open(tar_path) as tf:
        expected = {m.name: (m.offset_data, m.size) for m in tf if m.isfile()}
    assert native == expected


def test_synthetic_expression_dataset_world_sharing():
    """Continuous-expression generator: train/val share the WORLD (gene
    loadings + render basis) but draw different latent fields; items are
    deterministic; sentences are expression-ranked gene tokens."""
    import numpy as np

    from spatial_clip_tpu.data.datasets.synthetic import (
        SyntheticExpressionDataset,
    )

    tr = SyntheticExpressionDataset(num_samples=64, image_size=32, seed=0)
    va = SyntheticExpressionDataset(num_samples=64, image_size=32, seed=1)
    np.testing.assert_array_equal(tr._W, va._W)
    np.testing.assert_array_equal(tr._render_freq, va._render_freq)
    assert not np.array_equal(tr._z, va._z)
    a, b = tr[0], tr[0]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["raw_text"] == b["raw_text"]
    assert a["image"].shape == (32, 32, 3) and a["image"].dtype == np.uint8
    assert len(a["raw_text"].split()) == 50
    assert a["raw_text"] != tr[5]["raw_text"]
    assert len(a["neighbor_tile_ids"]) == 6
