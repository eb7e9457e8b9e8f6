#!/bin/bash
# Sentinel-gated bench hunter: probe the box's 32-thread headroom every
# few minutes and fire a full bench only inside a calm window; stop on
# the first sentinel-valid artifact. Written for the r10/r11 recurring
# host-CPU-steal problem — five manual attempts straddled steal waves.
# Usage: bench_hunter.sh [max_attempts] [mt_gate_seconds]
cd "$(dirname "$0")/.."
MAX=${1:-12}
GATE=${2:-0.36}
for i in $(seq 1 "$MAX"); do
    mt=$(python -c "
import sys; sys.path.insert(0,'.')
from bench import _sentinel
print(_sentinel()[1])")
    ok=$(python -c "print(1 if $mt <= $GATE else 0)")
    if [ "$ok" = "1" ]; then
        echo "attempt $i: mt=$mt <= $GATE — running bench" >&2
        python bench.py >"/tmp/bench_r11_auto_$i.json" \
            2>"/tmp/bench_r11_auto_$i.err"
        valid=$(python -c "
import json
s = json.loads(open('/tmp/bench_r11_auto_$i.json').read().strip().splitlines()[-1])
sent = s.get('sentinel') or {}
mts = [v[1] for v in sent.values()]
# stop only on a run that is BOTH rule-valid and calm through the
# middle: a start/final-valid run whose end sentinel doubled (the first
# r11 valid artifact) still carries inflated ingest lanes
calm_mid = bool(mts) and max(mts) <= 1.5 * min(mts)
print(1 if s.get('sentinel_valid') and calm_mid else 0)")
        echo "attempt $i: valid_and_calm=$valid" >&2
        if [ "$valid" = "1" ]; then
            cp "/tmp/bench_r11_auto_$i.json" /tmp/bench_r11_VALID.json
            cp bench_detail.json /tmp/bench_r11_VALID_detail.json
            echo "VALID artifact at /tmp/bench_r11_VALID.json" >&2
            exit 0
        fi
    else
        echo "attempt $i: mt=$mt > $GATE — box loud, waiting" >&2
    fi
    sleep 210
done
echo "no sentinel-valid run in $MAX attempts" >&2
exit 1
