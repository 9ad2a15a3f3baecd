"""Legacy-compatible CLI shim (ref contract: nov21.txt:2756-2816 — the Typer
shim proxied ``--config-name/--config-path/-o|--override`` plus a stage
argument into the config-driven entry via ``_invoke_hydra_process``; this is
the argparse equivalent, dependency-free)."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional


def _invoke_hydra_process(
    config_name: str, config_path: Optional[str], stage: str, overrides: List[str]
):
    """Compose the config and run the requested stage(s) in-process."""
    from spatial_clip_tpu.config import compose
    from spatial_clip_tpu.data.preprocessing.entry import run

    config_dir = Path(config_path or Path(__file__).parents[3] / "configs")
    name = config_name.replace(".yaml", "")
    if name.startswith("preprocess/"):
        group, _, fname = name.partition("/")
        cfg = compose(config_dir / group, fname, list(overrides))
    else:
        cfg = compose(config_dir, name, list(overrides))
    cfg.setdefault("run", {})["stage"] = stage
    return run(cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="spatial-clip-preprocess")
    parser.add_argument("--config-name", default="preprocess/default")
    parser.add_argument("--config-path", default=None)
    parser.add_argument(
        "-o", "--override", action="append", default=[], dest="overrides"
    )
    parser.add_argument("stage", nargs="?", default="full")
    args = parser.parse_args(argv)
    return _invoke_hydra_process(
        args.config_name, args.config_path, args.stage, args.overrides
    )


# simple object so tests can monkeypatch cli._invoke_hydra_process and invoke app
class _App:
    def __call__(self, argv=None):
        return main(argv)


app = _App()

if __name__ == "__main__":
    main(sys.argv[1:])
