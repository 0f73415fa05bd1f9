#!/bin/bash
# Round-15 chain: the full four-board refresh on HEAD with the WIDENED
# four-leg epoch probe (VERDICT r14 ask #1 — every board in this chain is
# the first to carry par_cpu_sec / rfsync_sec in its sidecar, making the
# probe->board transfer check applicable to all future same-SF pairs).
#  0. standalone epoch probe (pre-chain box-state record)
#  1. sf0.01 full board  -> reports/bench_sf001.json
#  2. sf0.1  full board  -> reports/bench_full.json (Bench writes it)
#  3. sf1    full board  -> reports/bench_sf1.json
#  4. sf10   full board  -> reports/bench_sf10.json (Bench writes it)
#  5. standing scaling report -> reports/scaling.json (epoch-annotated)
#  6. cross-round transfer check: r15 sf0.1 board vs BOTH archived r14
#     sf0.1 boards (same code up to this round's measurement-layer diff)
# Usage: nohup bash tools/r15_artifacts.sh > /tmp/r15_artifacts.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

if [ ! -d /tmp/testdata_sf1 ]; then
  bash tools/run_inflate.sh /root/testdata/sf0.1 /tmp/testdata_sf1 10
fi
if [ ! -d /tmp/testdata_sf10 ]; then
  bash tools/run_inflate.sh /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
echo "[r15] pre-chain epoch probe:"
java $AO -Xmx8g -cp target/scala-2.13/classes:"/opt/spark/jars/*" \
  graft.tools.EpochProbe "r15-pre-chain"

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
  || echo "[r15] flags need adjudication — solo re-profile then re-run standing_scaling.py"

python3 tools/standing_scaling.py --cross-round \
  reports/archive/r14_sf01_builder_head.json reports/bench_full.json \
  --out reports/cross_round_r14head_vs_r15.json
python3 tools/standing_scaling.py --cross-round \
  reports/archive/r14_sf01_driver.json reports/bench_full.json \
  --out reports/cross_round_r14driver_vs_r15.json
echo "[r15] artifacts done"
