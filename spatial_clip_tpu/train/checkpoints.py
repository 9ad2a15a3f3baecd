"""Checkpoint save/resume (orbax) + interchange formats.

Reference behaviors reproduced (ref: open_clip_train/main.py:136-168,380-399,
536-564): atomic latest-write, ``resume="latest"`` auto-discovery, epoch/step
state round-trip, delete-previous policy; plus torch-state-dict export for
checkpoint-compatible embeddings (ref: factory.py:181-225).
"""
from __future__ import annotations

import json
import logging
import re
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

log = logging.getLogger(__name__)

_STEP_RE = re.compile(r"step_(\d+)$")


def flatten_params(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


class CheckpointManager:
    """Step-indexed checkpoints under ``ckpt_dir`` with latest/best retention.

    Layout: ``ckpt_dir/step_{N}/state.msgpack`` + ``meta.json``. msgpack via
    flax.serialization keeps single-file checkpoints (simple to sync, atomic
    via tmp+rename like the reference's ``tmp.pt`` + ``os.replace``,
    main.py:559-564). Multi-host: only process 0 writes.
    """

    def __init__(
        self,
        ckpt_dir: str,
        keep: int = 3,
        save_most_recent: bool = True,
        async_save: bool = True,
    ):
        self.dir = Path(ckpt_dir)
        self.keep = keep
        self.save_most_recent = save_most_recent
        self.async_save = async_save
        self._pool = None
        self._pending = None
        self.dir.mkdir(parents=True, exist_ok=True)

    def _is_writer(self) -> bool:
        return jax.process_index() == 0

    def save(self, state: Dict[str, Any], step: int, metrics: Optional[Dict] = None):
        """Checkpoint ``state`` at ``step``. With ``async_save`` the device->
        host copy happens synchronously (cheap) and the serialization+fsync
        runs on a background thread so the train loop never blocks on disk
        (orbax-async-style; the reference blocks on torch.save)."""
        if not self._is_writer():
            return
        host_state = jax.tree.map(np.asarray, state)
        if self.async_save:
            from concurrent.futures import ThreadPoolExecutor

            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=1)
            self.wait()  # at most one write in flight
            self._pending = self._pool.submit(
                self._write, host_state, step, metrics
            )
            return
        self._write(host_state, step, metrics)

    def wait(self):
        """Block until any in-flight async save completes."""
        if self._pending is not None:
            self._pending.result()
            self._pending = None

    def _write(self, host_state: Dict[str, Any], step: int, metrics: Optional[Dict]):
        target = self.dir / f"step_{step}"
        tmp = self.dir / f".tmp_step_{step}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        (tmp / "state.msgpack").write_bytes(serialization.to_bytes(host_state))
        (tmp / "meta.json").write_text(
            json.dumps({"step": step, "metrics": metrics or {}}, default=float)
        )
        if target.exists():
            shutil.rmtree(target)
        tmp.rename(target)
        self._prune()
        log.info("Saved checkpoint %s", target)

    def _scan_steps(self):
        steps = []
        for p in self.dir.iterdir():
            m = _STEP_RE.search(p.name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def _prune(self):
        # runs on the writer thread — must NOT wait() on itself
        steps = self._scan_steps()
        for s in steps[: max(0, len(steps) - self.keep)]:
            shutil.rmtree(self.dir / f"step_{s}", ignore_errors=True)

    def all_steps(self):
        self.wait()  # reads must observe in-flight async writes
        return self._scan_steps()

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, target_state: Dict[str, Any], step: Optional[int] = None):
        """Restore into the structure of ``target_state``; step=None -> latest
        (the reference's ``--resume latest``, main.py:136-168)."""
        self.wait()
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.dir}")
        data = (self.dir / f"step_{step}" / "state.msgpack").read_bytes()
        restored = serialization.from_bytes(target_state, data)
        return restored, step


def save_params_npz(params: Dict[str, Any], path: str):
    """Portable flat-npz export of model params."""
    np.savez(path, **flatten_params(jax.tree.map(np.asarray, params)))


def load_params_npz(path: str) -> Dict[str, Any]:
    return unflatten_params(dict(np.load(path)))


def export_torch_state_dict(params: Dict[str, Any], path: str):
    """Write an open_clip-compatible torch checkpoint
    (north-star: checkpoint-compatible embeddings)."""
    from spatial_clip_tpu.models.convert import jax_to_torch_state_dict

    sd = jax_to_torch_state_dict(jax.tree.map(np.asarray, params))
    try:
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    except ImportError:
        np.savez(str(path) + ".npz", **sd)
