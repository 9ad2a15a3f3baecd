"""``python -m spatial_clip_tpu.data.preprocessing`` — config-driven pipeline
runner (ref: python -m src.data.preprocessing, docs/data_pipeline.md:44-47).

    python -m spatial_clip_tpu.data.preprocessing \
        --config-name preprocess/default run.stage=stage-1,stage-2
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

from spatial_clip_tpu.config import compose
from spatial_clip_tpu.data.preprocessing.entry import run
from spatial_clip_tpu.train.logging_utils import setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="Spatial-CLIP preprocessing")
    parser.add_argument("--config-name", default="preprocess/default")
    parser.add_argument("--config-path", default=None)
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    setup_logging()
    config_dir = Path(args.config_path or Path(__file__).parents[3] / "configs")
    name = args.config_name
    if name.startswith("preprocess/"):
        group, _, fname = name.partition("/")
        cfg = compose(config_dir / group, fname.replace(".yaml", ""), args.overrides)
    else:
        cfg = compose(config_dir, name.replace(".yaml", ""), args.overrides)
    result = run(cfg)
    print(result)
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
