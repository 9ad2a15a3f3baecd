"""Stage dispatch entry (the missing ``hydra_entry.py`` rebuilt from its test
contract, nov21.txt:2693-2756: ``_STAGE_FUNCS`` table, ``run.stage`` parsing
of ``full``/``full-pipeline``/single stages/comma lists; returns the last
stage's result)."""
from __future__ import annotations

import logging
from typing import Any, Dict

from spatial_clip_tpu.config.dotdict import DotDict
from spatial_clip_tpu.data.preprocessing.pipeline import (
    stage_01_merge_and_align,
    stage_02_normalize_and_filter,
    stage_03_create_shards,
)

log = logging.getLogger(__name__)

_STAGE_FUNCS = {
    "stage_1": stage_01_merge_and_align,
    "stage_2": stage_02_normalize_and_filter,
    "stage_3": stage_03_create_shards,
}

_FULL_ALIASES = {"full", "full_pipeline", "full-pipeline", "all"}


def _normalize(token: str) -> str:
    return token.strip().lower().replace("-", "_")


def parse_stages(spec: str) -> list:
    tokens = [_normalize(t) for t in str(spec).split(",") if t.strip()]
    if any(t in _FULL_ALIASES for t in tokens):
        return list(_STAGE_FUNCS)
    for t in tokens:
        if t not in _STAGE_FUNCS:
            raise ValueError(
                f"unknown stage '{t}'; valid: {sorted(_STAGE_FUNCS)} or 'full'"
            )
    return tokens


def run(cfg) -> Dict[str, Any]:
    cfg = DotDict.wrap(cfg if isinstance(cfg, dict) else dict(cfg))
    spec = cfg.get_path("run.stage", "full")
    result: Dict[str, Any] = {}
    for name in parse_stages(spec):
        log.info("Running preprocessing %s", name)
        # look the function up through the module table so tests can patch it
        result = _STAGE_FUNCS[name](cfg)
    return result
