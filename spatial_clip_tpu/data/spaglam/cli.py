"""spaglam CLI (ref: src/spaglam_preproc/cli.py:21-66): YAML config ->
validation -> single-pass shard pipeline -> QC report.

    python -m spatial_clip_tpu.data.spaglam.cli --config my_run.yaml run
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import yaml

from spatial_clip_tpu.data.spaglam.config import MainConfig
from spatial_clip_tpu.data.spaglam.dataset_writer import create_dataset_shards
from spatial_clip_tpu.data.spaglam.qc_tools import write_qc_report
from spatial_clip_tpu.data.spaglam.validation import pre_run_validation
from spatial_clip_tpu.train.logging_utils import setup_logging

log = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="spaglam")
    ap.add_argument("--config", required=True, help="YAML MainConfig")
    ap.add_argument("--skip-validation", action="store_true")
    ap.add_argument("command", nargs="?", default="run", choices=["run", "validate", "qc"])
    args = ap.parse_args(argv)
    setup_logging()

    with open(args.config) as f:
        cfg = MainConfig.from_dict(yaml.safe_load(f) or {})

    if args.command == "validate":
        report = pre_run_validation(cfg)
        print(json.dumps(report, indent=2))
        return report
    if args.command == "qc":
        report = write_qc_report(Path(cfg.paths.output_dir))
        print(json.dumps(report, indent=2))
        return report

    if not args.skip_validation:
        report = pre_run_validation(cfg)
        if not report["ok"]:
            log.error("pre-run validation failed: %s", report["problems"])
            sys.exit(2)
    stats = create_dataset_shards(cfg)
    if cfg.quality_control.emit_qc_report:
        write_qc_report(Path(cfg.paths.output_dir))
    print(json.dumps(stats, indent=2))
    return stats


if __name__ == "__main__":
    main()
