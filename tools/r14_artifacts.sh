#!/bin/bash
# Round-14 measurement-closure chain (VERDICT r13 asks #1 and #3): the
# full four-board refresh on HEAD — the committed r13 boards predate the
# review sweep's two plan-touching improvements, and the 249.7 vs 202.8 s
# box-epoch question must close with a board, not prose. Every board now
# records the box-epoch calibration probe (Bench.epochProbe) in its
# sidecar, so this chain is the first whose legs are mechanically
# comparable with every future board.
#  0. standalone epoch probe (pre-chain box-state record)
#  1. sf0.01 full board  -> reports/bench_sf001.json
#  2. sf0.1  full board  -> reports/bench_full.json (Bench writes it)
#  3. sf1    full board  -> reports/bench_sf1.json
#  4. sf10   full board  -> reports/bench_sf10.json (Bench writes it)
#  5. standing scaling report -> reports/scaling.json (epoch-annotated)
# Usage: nohup bash tools/r14_artifacts.sh > /tmp/r14_artifacts.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

if [ ! -d /tmp/testdata_sf1 ]; then
  bash tools/run_inflate.sh /root/testdata/sf0.1 /tmp/testdata_sf1 10
fi
if [ ! -d /tmp/testdata_sf10 ]; then
  bash tools/run_inflate.sh /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
echo "[r14] pre-chain epoch probe:"
java $AO -Xmx4g -cp target/scala-2.13/classes:"/opt/spark/jars/*" \
  graft.tools.EpochProbe

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
  || echo "[r14] flags need adjudication — solo re-profile then re-run standing_scaling.py"
echo "[r14] artifacts done"
