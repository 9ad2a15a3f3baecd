"""WebDataset-layout tar shard writer (stdlib tarfile).

Replaces the reference's ``wds.ShardWriter`` dependency
(ref: dataset_writer.py:238-292): samples are dicts whose ``__key__`` names
the record and whose other keys are ``<ext>`` -> payload; payloads may be
bytes, str, numpy arrays (``.npy``), PIL images (``.png``/``.jpg``), or
json-serializable objects (``.json``).
"""
from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _encode(ext: str, value: Any) -> bytes:
    if isinstance(value, bytes):
        return value
    if isinstance(value, str):
        return value.encode("utf-8")
    if ext == "json":
        return json.dumps(value, default=float).encode("utf-8")
    if ext in ("png", "jpg", "jpeg"):
        from PIL import Image

        if isinstance(value, np.ndarray):
            value = Image.fromarray(value)
        buf = io.BytesIO()
        value.save(buf, format="PNG" if ext == "png" else "JPEG")
        return buf.getvalue()
    if ext == "npy":
        buf = io.BytesIO()
        np.save(buf, np.asarray(value))
        return buf.getvalue()
    raise TypeError(f"cannot encode extension .{ext} from {type(value)}")


class ShardWriter:
    """Writes ``pattern % shard_index`` tars, rolling over at ``maxcount``."""

    def __init__(self, pattern: str, maxcount: int = 5000):
        self.pattern = pattern
        self.maxcount = maxcount
        self.shard_index = 0
        self.count = 0
        self.total = 0
        self._tar: Optional[tarfile.TarFile] = None
        self.shards = []

    def _roll(self):
        if self._tar is not None:
            self._tar.close()
        path = Path(self.pattern % self.shard_index)
        path.parent.mkdir(parents=True, exist_ok=True)
        self._tar = tarfile.open(path, "w")
        self.shards.append(str(path))
        self.shard_index += 1
        self.count = 0

    def write(self, sample: Dict[str, Any]):
        key = sample["__key__"]
        if self._tar is None or self.count >= self.maxcount:
            self._roll()
        for ext, value in sample.items():
            if ext.startswith("__"):
                continue
            payload = _encode(ext.split(".")[-1], value)
            info = tarfile.TarInfo(name=f"{key}.{ext}")
            info.size = len(payload)
            self._tar.addfile(info, io.BytesIO(payload))
        self.count += 1
        self.total += 1

    def close(self):
        if self._tar is not None:
            self._tar.close()
            self._tar = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
