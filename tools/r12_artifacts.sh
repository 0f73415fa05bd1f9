#!/bin/bash
# Round-12 artifact refresh — all four boards in ONE pass each (heap-sized
# by tools/run_bench.sh; no stitching), then the standing scaling report.
#  1. sf0.01 full board  -> reports/bench_sf001.json
#  2. sf0.1  full board  -> reports/bench_full.json (Bench writes it)
#  3. sf1    full board  -> reports/bench_sf1.json
#  4. sf10   full board  -> reports/bench_sf10.json (Bench writes it)
#  5. standing scaling report -> reports/scaling.json
# Usage: nohup bash tools/r12_artifacts.sh > /tmp/r12_artifacts.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

if [ ! -d /tmp/testdata_sf1 ]; then
  bash tools/run_inflate.sh /root/testdata/sf0.1 /tmp/testdata_sf1 10
fi
if [ ! -d /tmp/testdata_sf10 ]; then
  bash tools/run_inflate.sh /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

bash tools/run_bench.sh /root/testdata/sf0.01 "" sf001
cp /tmp/bench_sf001.json reports/bench_sf001.json

bash tools/run_bench.sh /root/testdata/sf0.1 "" sf01
# Bench wrote reports/bench_full.json

bash tools/run_bench.sh /tmp/testdata_sf1 "" sf1
cp /tmp/bench_sf1.json reports/bench_sf1.json

bash tools/run_bench.sh /tmp/testdata_sf10 "" sf10
# Bench wrote reports/bench_sf10.json

python3 tools/standing_scaling.py reports/bench_sf001.json \
  reports/bench_full.json reports/bench_sf1.json reports/bench_sf10.json \
  || echo "[r12] flags need adjudication — solo re-profile then re-run standing_scaling.py"
echo "[r12] artifacts done"
