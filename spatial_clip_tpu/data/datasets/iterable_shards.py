"""Streaming tar-shard dataset (sequential reads, no index).

The reference's webdataset pipeline streams tars (ref: open_clip_train/
data.py:328-443: brace-expanded shard lists, split_by_node/worker,
shuffle buffers, non-throwing tar expansion :186-219). This is the JAX-side
equivalent for datasets larger than local disk / on network storage:

- shards are assigned round-robin to (host, worker) pairs,
- each tar is read **sequentially** (no random access — network-friendly),
- samples pass through a bounded shuffle buffer,
- corrupt members are logged and skipped (log_and_continue semantics).

Spatial neighbor graphs need random access, so this backend serves plain
CLIP-style training; use ShardedSpatialDataset for the spatial loss.
"""
from __future__ import annotations

import io
import json
import logging
import re
import tarfile
from typing import Callable, Iterator, List, Optional, Sequence, Union

import numpy as np

log = logging.getLogger(__name__)

_BRACE_RE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def braceexpand(s: str) -> List[str]:
    """Minimal '{000000..000009}' numeric brace expansion (the subset the
    webdataset shard convention uses; stdlib-only)."""
    m = _BRACE_RE.search(s)
    if not m:
        return [s]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(braceexpand(s[: m.start()] + f"{i:0{width}d}" + s[m.end():]))
    return out


def expand_shard_urls(spec: Union[str, Sequence[str]]) -> List[str]:
    """Brace-expand 'shard-{000000..000009}.tar' style specs
    (ref: data.py expand_urls). Also accepts glob patterns."""
    if isinstance(spec, str):
        specs = spec.split("::")[0].split()
    else:
        specs = list(spec)
    out: List[str] = []
    for s in specs:
        expanded = braceexpand(s)
        if len(expanded) == 1 and ("*" in s or "?" in s):
            import glob as _glob

            out.extend(_glob.glob(s))
        else:
            out.extend(expanded)
    return out


class IterableTarDataset:
    """Iterates (image, text, meta) samples from tar shards, streaming."""

    def __init__(
        self,
        shards: Union[str, Sequence[str]],
        preprocess_fn: Optional[Callable] = None,
        tokenizer: Optional[Callable] = None,
        shuffle_buffer: int = 0,
        seed: int = 0,
        split_by_process: bool = True,
        k_neighbors: int = 1,
    ):
        self.shards = sorted(expand_shard_urls(shards))
        if not self.shards:
            raise ValueError("no shards matched")
        self.preprocess_fn = preprocess_fn
        self.tokenizer = tokenizer
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.split_by_process = split_by_process
        self.k_neighbors = max(k_neighbors, 1)
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _my_shards(self) -> List[str]:
        shards = list(self.shards)
        rng = np.random.default_rng(self.seed + self._epoch)
        rng.shuffle(shards)  # deterministic epoch-synced shard order
        if self.split_by_process:
            import jax

            pc, pi = jax.process_count(), jax.process_index()
            if pc > 1:
                shards = shards[pi::pc]
        return shards

    def _iter_raw(self) -> Iterator[dict]:
        counter = 0
        for shard in self._my_shards():
            try:
                with tarfile.open(shard) as tf:
                    group: dict = {}
                    key = None
                    for m in tf:
                        if not m.isfile():
                            continue
                        stem, _, ext = m.name.rpartition(".")
                        if key is not None and stem != key and group:
                            sample = self._build(key, group, counter)
                            if sample is not None:
                                counter += 1
                                yield sample
                            group = {}
                        key = stem
                        try:
                            group[ext] = tf.extractfile(m).read()
                        except Exception as e:  # log_and_continue
                            log.warning("skipping member %s: %s", m.name, e)
                    if group and key is not None:
                        sample = self._build(key, group, counter)
                        if sample is not None:
                            counter += 1
                            yield sample
            except Exception as e:  # tolerate corrupt shards
                log.warning("skipping shard %s: %s", shard, e)

    def _build(self, key: str, group: dict, idx: int) -> Optional[dict]:
        try:
            if "npy" in group:
                image = np.load(io.BytesIO(group["npy"]), allow_pickle=False)
                if self.preprocess_fn is not None and not getattr(
                        self.preprocess_fn, "accepts_ndarray", False):
                    from PIL import Image

                    # user callables keep the documented PIL contract
                    image = Image.fromarray(image)
            elif "png" in group or "jpg" in group or "jpeg" in group:
                raw = group.get("png") or group.get("jpg") or group.get("jpeg")
                # native decode only where it replaces the PIL trip entirely
                # (no transform, or a val transform consuming target-size
                # RGB8 untouched) — see shard_backend.py / experiments.md
                from spatial_clip_tpu.data.native_decode import (
                    decode_rgb,
                    decode_rgb_into,
                )

                image = None
                if self.preprocess_fn is None:
                    image = decode_rgb(raw)
                else:
                    fast = getattr(self.preprocess_fn,
                                   "ndarray_fast_size", None)
                    if fast is not None:
                        out = np.empty((*fast, 3), np.uint8)
                        if decode_rgb_into(raw, out):
                            image = out
                if image is None:
                    from PIL import Image

                    image = Image.open(io.BytesIO(raw)).convert("RGB")
            else:
                return None
            if self.preprocess_fn is not None:
                image = self.preprocess_fn(image)
            else:
                image = np.asarray(image)
            sentence = group.get("txt", b"").decode("utf-8")
            text = (
                np.asarray(self.tokenizer([sentence])[0])
                if self.tokenizer
                else np.zeros(8, dtype=np.int32)
            )
            meta = json.loads(group["json"]) if "json" in group else {}
            return {
                "image": image,
                "text": text,
                "raw_text": sentence,
                "anchor_tile_id": idx,
                "neighbor_tile_ids": [-1] * self.k_neighbors,
                "neighbor_alphas": [0.0] * self.k_neighbors,
                "meta": meta,
            }
        except Exception as e:  # per-sample isolation
            log.warning("skipping sample %s: %s", key, e)
            return None

    def __iter__(self) -> Iterator[dict]:
        it = self._iter_raw()
        if self.shuffle_buffer <= 1:
            yield from it
            return
        rng = np.random.default_rng(self.seed * 7919 + self._epoch)
        buf: List[dict] = []
        for sample in it:
            buf.append(sample)
            if len(buf) >= self.shuffle_buffer:
                j = int(rng.integers(len(buf)))
                buf[j], buf[-1] = buf[-1], buf[j]
                yield buf.pop()
        rng.shuffle(buf)
        yield from buf


def iter_batches(dataset: IterableTarDataset, batch_size: int, collate_fn=None):
    """Drop-last batching over a streaming dataset."""
    from spatial_clip_tpu.data.datamodule import collate_spatial

    collate = collate_fn or collate_spatial
    buf: List[dict] = []
    for sample in dataset:
        sample.pop("meta", None)
        buf.append(sample)
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []
