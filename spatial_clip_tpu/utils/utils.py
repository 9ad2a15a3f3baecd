"""Task utilities (ref: src/utils/utils.py:12-119).

- ``task_wrapper``: catches task exceptions, logs them, always finalizes
  loggers, and writes the exception to the run dir (ref: :43-95).
- ``extras``: pre-task config hygiene (tag enforcement, config print)
  (ref: :12-40).
- ``get_metric_value``: safely pull the optimized metric for sweeps
  (ref: :98-119).
"""
from __future__ import annotations

import functools
import logging
import traceback
from pathlib import Path
from typing import Any, Callable, Dict, Optional

log = logging.getLogger(__name__)


def task_wrapper(task_func: Callable) -> Callable:
    @functools.wraps(task_func)
    def wrap(cfg: Dict[str, Any], *args, **kwargs):
        try:
            return task_func(cfg, *args, **kwargs)
        except Exception:
            out_dir = Path(
                (cfg.get("paths") or {}).get("output_dir", ".")
                if isinstance(cfg, dict)
                else "."
            )
            out_dir.mkdir(parents=True, exist_ok=True)
            (out_dir / "exception.log").write_text(traceback.format_exc())
            log.exception("Task failed")
            raise
        finally:
            logging.shutdown()

    return wrap


def extras(cfg: Dict[str, Any]) -> None:
    if not cfg.get("tags"):
        log.warning("No tags provided in config! (cfg.tags)")
    if cfg.get("print_config", False):
        import json

        log.info("Config:\n%s", json.dumps(cfg, indent=2, default=str))


def get_metric_value(
    metric_dict: Dict[str, Any], metric_name: Optional[str]
) -> Optional[float]:
    if not metric_name:
        log.info("Metric name is None! Skipping metric value retrieval...")
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"Metric value not found: '{metric_name}'. Available: {sorted(metric_dict)}"
        )
    value = metric_dict[metric_name]
    log.info("Retrieved metric %s = %s", metric_name, value)
    return float(value)
