"""Background remote checkpoint sync.

TPU-native analogue of the reference's S3/fsspec sync
(ref: src/open_clip_train/file_utils.py:11-64 ``remote_sync``/
``start_sync_process``, wired at main.py:174-194): a daemon process copies
the run directory to a remote location every ``sync_every`` seconds,
skipping in-flight "latest" files that can change mid-copy.

Protocols:
- ``local`` (default): plain filesystem copy — covers NFS / mounted-bucket
  deployments and is fully testable offline.
- ``fsspec``: generic fsspec mapper copy (s3://, gs://, ...) when fsspec is
  installed — gated, warns otherwise.
- ``s3``: ``aws s3 sync`` subprocess when the aws CLI exists.
"""
from __future__ import annotations

import logging
import multiprocessing
import shutil
import subprocess
import time
from pathlib import Path

log = logging.getLogger(__name__)

# files that may be mid-write when the sync fires (atomic-replace targets)
SKIP_SUBSTRINGS = ("latest", ".tmp")


def _should_skip(name: str) -> bool:
    return any(s in name for s in SKIP_SUBSTRINGS)


def remote_sync_local(local_dir: str, remote_dir: str) -> bool:
    src = Path(local_dir)
    dst = Path(remote_dir)
    try:
        dst.mkdir(parents=True, exist_ok=True)
        for p in src.rglob("*"):
            if p.is_dir() or _should_skip(p.name):
                continue
            rel = p.relative_to(src)
            target = dst / rel
            if target.exists() and target.stat().st_size == p.stat().st_size:
                continue
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(p, target)
        return True
    except OSError as e:
        log.error("local remote-sync failed: %s", e)
        return False


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    try:
        import fsspec
    except ImportError:
        log.error("fsspec not installed; use protocol 'local' or 's3'")
        return False
    a = fsspec.get_mapper(local_dir)
    b = fsspec.get_mapper(remote_dir)
    ok = True
    for k in a:
        if _should_skip(k):
            continue
        try:
            if k in b and len(a[k]) == len(b[k]):
                continue
            b[k] = a[k]
        except Exception as e:  # noqa: BLE001 — remote backends raise anything
            log.error("fsspec sync error for %s: %s", k, e)
            ok = False
    return ok


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir, "--exclude", "*latest*"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    if result.returncode != 0:
        log.error("aws s3 sync failed: %s", result.stderr.decode())
        return False
    return True


_PROTOCOLS = {
    "local": remote_sync_local,
    "fsspec": remote_sync_fsspec,
    "s3": remote_sync_s3,
}


def remote_sync(local_dir: str, remote_dir: str, protocol: str = "local") -> bool:
    fn = _PROTOCOLS.get(protocol)
    if fn is None:
        log.error("unknown remote-sync protocol %r", protocol)
        return False
    return fn(local_dir, remote_dir)


def _keep_running(sync_every: float, local_dir: str, remote_dir: str, protocol: str):
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(
    sync_every: float, local_dir: str, remote_dir: str, protocol: str = "local"
) -> multiprocessing.Process:
    """Daemon process syncing every ``sync_every`` seconds; caller starts it
    after verifying one synchronous ``remote_sync`` succeeds (ref:
    main.py:175-189)."""
    p = multiprocessing.Process(
        target=_keep_running, args=(sync_every, local_dir, remote_dir, protocol),
        daemon=True,
    )
    return p
