#!/bin/bash
# Poll the bench's own host probe every 2 minutes; when the 100MB-stream
# probe drops under the threshold (a calm window on the shared host), run
# the frozen bench once and exit. Used in round 6 to catch the clean-window
# artifact BENCH/headline_r06_clean.json.
THRESH="${SDV_CALM_THRESHOLD:-2.6}"
cd "$(dirname "$0")/.."
for i in $(seq 1 120); do
  S=$(python -c "
import sys; sys.path.insert(0,'.')
from bench import host_probe
print(host_probe(32)['stream_sec'])" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe stream_sec=$S"
  if python -c "import sys; sys.exit(0 if float('$S') < float('$THRESH') else 1)"; then
    echo "$(date +%H:%M:%S) window calm, running bench"
    python bench.py > "/tmp/bench_calm_$(date +%H%M%S).json" 2>/tmp/bench_calm.log
    echo "$(date +%H:%M:%S) bench done rc=$?"
    exit 0
  fi
  sleep 120
done
