#!/usr/bin/env python
"""Manifest inspector (ref: scripts/inspect_manifest.py:27-91).

    python scripts/inspect_manifest.py data/processed/hest_v1
    python scripts/inspect_manifest.py data/processed/ds/manifest.json --no-check-files
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def inspect(target: Path, check_files: bool = True) -> dict:
    manifest_path = target if target.suffix == ".json" else target / "manifest.json"
    if not manifest_path.exists():
        raise FileNotFoundError(manifest_path)
    manifest = json.loads(manifest_path.read_text())
    problems = []
    root = manifest_path.parent
    if check_files:
        shards = sorted(root.rglob("*.tar"))
        declared = manifest.get("outputs", {}).get("shard_count")
        if declared is not None and declared != len(shards):
            problems.append(
                f"shard_count mismatch: manifest={declared} on-disk={len(shards)}"
            )
        for sd in manifest.get("outputs", {}).get("sample_dirs", []):
            if not (root / sd).is_dir():
                problems.append(f"missing sample dir: {sd}")
    summary = {
        "manifest": str(manifest_path),
        "dataset": manifest.get("dataset"),
        "created": manifest.get("timing", {}).get("finished_at"),
        "total_processed": manifest.get("stats", {}).get("total_processed"),
        "total_failed": manifest.get("stats", {}).get("total_failed"),
        "shard_count": manifest.get("outputs", {}).get("shard_count"),
        "total_bytes": manifest.get("outputs", {}).get("total_bytes"),
        "git_commit": manifest.get("git", {}).get("commit"),
        "problems": problems,
        "ok": not problems,
    }
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("target", type=Path)
    ap.add_argument("--no-check-files", action="store_true")
    args = ap.parse_args(argv)
    summary = inspect(args.target, check_files=not args.no_check_files)
    print(json.dumps(summary, indent=2))
    if not summary["ok"]:
        sys.exit(1)
    return summary


if __name__ == "__main__":
    main()
