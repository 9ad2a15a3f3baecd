"""CI variant of the end-to-end rehearsal (ref: docs/data_pipeline.md:39-105
flow; VERDICT r2 item 9): synth slides -> 3-stage preprocess -> shard
validation -> gap stats -> train.py on the shards -> eval.py restore."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parents[1]


@pytest.mark.slow
def test_e2e_rehearsal_smoke(tmp_path):
    out = tmp_path / "report.json"
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts/e2e_rehearsal.py"), "--smoke",
         "--workdir", str(tmp_path / "work"), "--out", str(out)],
        capture_output=True, text=True, timeout=1800,
    )
    assert rc.returncode == 0, rc.stdout[-3000:] + rc.stderr[-3000:]
    report = json.loads(out.read_text())
    assert report["preprocess"]["total_processed"] == 4 * 24
    assert report["preprocess"]["spots_per_sec"] > 0
    assert report["preprocess"]["shard_count"] >= 4
    assert "eval" in report and "test/R@1" in report["eval"]
