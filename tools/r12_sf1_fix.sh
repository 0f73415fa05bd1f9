#!/bin/bash
# Round-12 knob-trigger fix validation (run AFTER the artifact chain and
# AFTER `sbt compile` has rebuilt target/ with the KnobRowsFloor trigger):
#  1. A/B at sf1 on the scan-heavy graph subset: knobs forced OFF
#     (SPARK_GRAFT_FORCE_TUNE=0 = the broken chain-leg behavior) vs
#     default (rows>=2M -> on). Expect the forced-off leg ~+3 s/face.
#  2. Full sf1 board re-run with the fix -> reports/bench_sf1.json
#     (expect ~383 s warm, the r11-proven config).
#  3. sf0.1 transit+dedup subset sanity: rows<2M keeps stock (expect
#     ~113 s, the gated A/B leg).
# Usage: nohup bash tools/r12_sf1_fix.sh > /tmp/r12_sf1_fix.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

# (the full-board delta vs the chain leg IS the A/B: the chain leg ran
# the same code with the knobs gated off at sf1 — 440.3 s warm; r11's
# knobs-on config measured 382.6 s)
echo "[sf1fix] full sf1 board with the rows-trigger"
bash tools/run_bench.sh /tmp/testdata_sf1 "" sf1
cp /tmp/bench_sf1.json reports/bench_sf1.json

echo "[sf1fix] sf0.1 subset sanity (must match the gated A/B leg ~113s)"
bash tools/run_bench.sh /root/testdata/sf0.1 "transit,dedup" sf01_sanity
python3 - <<'EOF'
import json
s=json.load(open('/tmp/bench_sf01_sanity.json'))['queries']
print(f"[sf1fix] sf0.1 transit+dedup warm total {sum(v['warm'] for v in s.values()):.1f}s (gated A/B leg was 113.1)")
EOF
echo "[sf1fix] done"
