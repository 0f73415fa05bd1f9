#!/bin/bash
# Round-16 chain: the full four-board refresh on HEAD, with the transfer
# check run PER BOARD against the archived r15 same-SF sidecar (VERDICT
# r15 ask #3 — the r15 sf0.01 board moved 1.11x with no mechanical check
# because only sf0.1 had archived sidecars), using the per-face empirical
# variance bands (ask #1) and the ledger-derived probe tolerances (ask #4)
# in place of the flat 2x face cut and the hand-pinned EPOCH_TOL.
#  0. archive the r15 sidecars (cp -n: already done by the session; noop)
#  1. face bands from the five same-code sf0.1 boards -> reports/face_bands_sf01.json
#  2. ledger tolerances -> reports/epoch_tolerances.json
#  3. standalone epoch probe (pre-chain box-state record)
#  4. sf0.01 / sf0.1 / sf1 / sf10 full boards
#  5. standing scaling report -> reports/scaling.json (epoch-annotated)
#  6. cross-round transfer check per SF: r15 vs r16, same-SF sidecars
#     (sf0.1 leg consumes the bands; every leg consumes the tolerances)
# Usage: nohup bash tools/r16_artifacts.sh > /tmp/r16_artifacts.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

cp -n reports/bench_sf001.json reports/archive/r15_sf001.json || true
cp -n reports/bench_full.json  reports/archive/r15_sf01_driver.json || true
cp -n reports/bench_sf1.json   reports/archive/r15_sf1.json || true
cp -n reports/bench_sf10.json  reports/archive/r15_sf10.json || true

python3 tools/standing_scaling.py --face-bands \
  reports/archive/r13_sf01_builder_quiet.json \
  reports/archive/r13_sf01_driver.json \
  reports/archive/r14_sf01_builder_head.json \
  reports/archive/r14_sf01_driver.json \
  reports/archive/r15_sf01_driver.json \
  --out reports/face_bands_sf01.json

python3 tools/standing_scaling.py --ledger-bands reports/epoch_ledger.jsonl \
  --out reports/epoch_tolerances.json

if [ ! -d /tmp/testdata_sf1 ]; then
  bash tools/run_inflate.sh /root/testdata/sf0.1 /tmp/testdata_sf1 10
fi
if [ ! -d /tmp/testdata_sf10 ]; then
  bash tools/run_inflate.sh /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
echo "[r16] pre-chain epoch probe:"
java $AO -Xmx8g -cp target/scala-2.13/classes:"/opt/spark/jars/*" \
  graft.tools.EpochProbe "r16-pre-chain"

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
  || echo "[r16] flags need adjudication — solo re-profile then re-run standing_scaling.py"

# per-SF transfer checks vs the archived r15 boards (same code up to this
# round's measurement-layer diff). Only the sf0.1 pair has enough archived
# same-code boards for empirical bands; the other SFs run the flat cut.
python3 tools/standing_scaling.py --cross-round \
  reports/archive/r15_sf001.json reports/bench_sf001.json \
  --tolerances reports/epoch_tolerances.json \
  --out reports/cross_round_r15_vs_r16_sf001.json
python3 tools/standing_scaling.py --cross-round \
  reports/archive/r15_sf01_driver.json reports/bench_full.json \
  --bands reports/face_bands_sf01.json \
  --tolerances reports/epoch_tolerances.json \
  --out reports/cross_round_r15_vs_r16_sf01.json
python3 tools/standing_scaling.py --cross-round \
  reports/archive/r15_sf1.json reports/bench_sf1.json \
  --tolerances reports/epoch_tolerances.json \
  --out reports/cross_round_r15_vs_r16_sf1.json
python3 tools/standing_scaling.py --cross-round \
  reports/archive/r15_sf10.json reports/bench_sf10.json \
  --tolerances reports/epoch_tolerances.json \
  --out reports/cross_round_r15_vs_r16_sf10.json
echo "[r16] artifacts done"
