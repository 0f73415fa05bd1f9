#!/bin/bash
# Round-12 post-chain follow-ups (quiet box required — run AFTER
# tools/r12_artifacts.sh completes):
#  1. HTTP listener latency with the r12 ServingCache, sf0.1 + sf1
#     -> reports/http_serve.json (overwritten: the r11 numbers are the
#        pre-cache baseline, quoted in bench notes)
#  2. sf10 mongo-export leg decomposition with the gzip'd JSONL sink
#     -> /tmp/oneshot_mongo_sf10_r12.log (ask #6 done-check: steady-state
#        roundtrip <= ~60 s)
# Usage: nohup bash tools/r12_followups.sh > /tmp/r12_followups.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
CLS="target/scala-2.13/classes"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

# HttpServe.main writes/merges reports/http_serve.json itself (one JSONL
# row per sfDir, prior rows for the same dir replaced)
for SF in /root/testdata/sf0.1 /tmp/testdata_sf1; do
  echo "[followups] http_serve $SF"
  SPARK_GRAFT_SF_DIR="$SF" \
    java $AO -Xmx16g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CLS:/opt/spark/jars/*" \
      graft.tools.HttpServe 0 1000 8 2>/dev/null | grep '^{"metric"' || true
done
cat reports/http_serve.json

# The chain's sf0.01 leg showed a +9.5 s dedup-family drift vs r11 that
# the sf0.1 A/B can't explain (its dedup deltas were sub-0.3 s) — re-run
# on a known-quiet box to separate interference from a real shift
echo "[followups] sf0.01 re-run (quiet box)"
bash tools/run_bench.sh /root/testdata/sf0.01 "" sf001b
python3 - <<'EOF'
import json
a=json.load(open('/root/repo/reports/bench_sf001.json'))['queries']
b=json.load(open('/tmp/bench_sf001b.json'))['queries']
ta=sum(v['warm'] for v in a.values()); tb=sum(v['warm'] for v in b.values())
print(f"[followups] sf0.01 chain-leg {ta:.1f}s vs quiet re-run {tb:.1f}s")
EOF
# the quiet re-run is the better artifact (the chain leg overlapped the
# previous session's wind-down)
cp /tmp/bench_sf001b.json reports/bench_sf001.json

echo "[followups] mongo export legs at sf10 (gzip sink)"
SPARK_GRAFT_SF_DIR=/tmp/testdata_sf10 \
  java $AO -Xmx96g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CLS:/opt/spark/jars/*" \
    graft.tools.OneShot mongo_docs_noop mongo_write_docs mongo_read_flatten \
  2>/dev/null | grep '^\[oneshot\]' | tee /tmp/oneshot_mongo_sf10_r12.log
echo "[followups] done"
