#!/bin/bash
# Round-12 tail: runs after tools/r12_sf1_fix.sh —
#  1. one-pass sf10 board at the capped 48 GiB heap -> reports/bench_sf10.json
#  2. tools/r12_followups.sh (http-serve latency, quiet sf0.01 re-run,
#     sf10 gzip'd mongo-export leg decomposition)
#  3. the standing scaling report over the final four boards
# Usage: nohup bash tools/r12_tail.sh > /tmp/r12_tail.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

# wait for r12_sf1_fix.sh to print its done marker AND for any bench
# java to exit (strict serialization: the r12 lesson — concurrent JVMs
# corrupt warm numbers; a bare pgrep loop could fire in the gap BETWEEN
# the sf1fix script's two bench runs). The bench-java pattern must be
# anchored on the -cp flag: a bare 'graft.Bench' substring also matches
# harness processes whose command line EMBEDS that string as prose,
# which deadlocks this loop.
while ! grep -q '\[sf1fix\] done' /tmp/r12_sf1_fix.log 2>/dev/null; do sleep 30; done
while pgrep -f 'classes:/opt/spark/jars/\* graft\.' > /dev/null; do sleep 30; done

bash tools/run_bench.sh /tmp/testdata_sf10 "" sf10
# Bench wrote reports/bench_sf10.json (48g one-pass)

bash tools/r12_followups.sh

python3 tools/standing_scaling.py reports/bench_sf001.json \
  reports/bench_full.json reports/bench_sf1.json reports/bench_sf10.json \
  || echo "[r12-tail] flags need adjudication"
echo "[r12-tail] done"
