#!/bin/bash
# Round-13 final artifact refresh — the full chain re-run on the settled
# round-13 code (review fixes + the page-cache quiesce in Bench), one pass
# per board at the 48 GiB-capped heap:
#  1. sf0.01 full board  -> reports/bench_sf001.json
#  2. sf0.1  full board  -> reports/bench_full.json (Bench writes it)
#  3. sf1    full board  -> reports/bench_sf1.json
#  4. sf10   full board  -> reports/bench_sf10.json (Bench writes it)
#  5. standing scaling report -> reports/scaling.json
# Usage: nohup bash tools/r13_artifacts.sh > /tmp/r13_artifacts.log 2>&1 &
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
  || echo "[r13] flags need adjudication — solo re-profile then re-run standing_scaling.py"
echo "[r13] artifacts done"
