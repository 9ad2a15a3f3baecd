#!/bin/bash
# Session-7 chained chip job: wait for the flanes A/B (pid file), pick the
# winning arm, then capture a fresh 240-step bench.py number with the
# winner pinned via SPATIAL_CLIP_FWD_LANES (no code edits needed).
set -u
# Guard against a missing/stale pid file: without this, an empty PID makes
# the wait loop exit immediately and the chained bench would race the
# still-running A/B job for the chip (the contention CLAUDE.md warns about).
[ -f /tmp/ab_flanes.pid ] || { echo "no /tmp/ab_flanes.pid; refusing to chain" >&2; exit 1; }
PID=$(cat /tmp/ab_flanes.pid)
[ -n "$PID" ] || { echo "empty pid file; refusing to chain" >&2; exit 1; }
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
cd /root/repo
# Trust the report only if it exists and postdates the job we waited on.
if [ ! -f reports/ab_flanes_r3s7.json ] || [ reports/ab_flanes_r3s7.json -ot /tmp/ab_flanes.pid ]; then
  echo "reports/ab_flanes_r3s7.json missing or older than the pid file; stale — aborting" >&2
  exit 1
fi
WINNER=$(python - <<'EOF'
import json, sys
try:
    d = json.load(open("reports/ab_flanes_r3s7.json"))
except Exception:
    print("none"); sys.exit()
base = d.get("auto^scan32^nu", {}).get("ms_per_step_median")
best_arm, best_ms = None, None
for arm, r in d.items():
    ms = r.get("ms_per_step_median")
    if ms is not None and (best_ms is None or ms < best_ms):
        best_arm, best_ms = arm, ms
if base is None or best_arm is None:
    print("none")
elif "flanes" in best_arm and base - best_ms > 0.25:
    import re
    print(re.search(r"flanes(\d+)", best_arm).group(1))
else:
    print("default")
EOF
)
echo "chain: winner=$WINNER" > /tmp/chain_bench.log
if [ "$WINNER" = "none" ]; then exit 0; fi
if [ "$WINNER" != "default" ]; then
    export SPATIAL_CLIP_FWD_LANES="$WINNER"
fi
python bench.py >> /tmp/chain_bench.log 2>&1
