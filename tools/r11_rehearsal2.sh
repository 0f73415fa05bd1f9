#!/bin/bash
# Round-11 sf10 rehearsal, CLEAN-DATA re-run.
#
# The first r11 rehearsal (tools/r11_rehearsal.sh) — and the r10 spotcheck
# it merged with — measured the sf10 leg against rehearsal data produced by
# the FIXED-offset InflateSf, which collides clone keys when inflating
# already-inflated data (2.55 M duplicate trip_ids at sf10 → every
# trips-join face processed a 402 M-row join instead of 60 M, a 6.7×
# cardinality blowup; doc_id/vec_id collided the same way). InflateSf now
# derives the offset from the source's actual key range and asserts
# distinct-key conservation; /tmp/testdata_sf10 is regenerated clean.
#
# This script re-measures BOTH legs for the full 43-pipeline subset
# (the 40 of the first rehearsal + the three r10-added operators
# X215-X217 per VERDICT ask #8) so the sf1->sf10 decade in
# reports/scaling_sf10_r11.json is clean on both sides.
# Usage: nohup bash tools/r11_rehearsal2.sh > /tmp/r11_rehearsal2.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
CLS="${1:-target/scala-2.13/classes}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUN="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CLS:/opt/spark/jars/*"

Q40=$(python3 -c "import json; print(','.join(sorted(json.load(open('/tmp/bench_sf1_r11_merged.json'))['queries'])))")
FRESH="$Q40,dedup_soft_weights,mm_payload_neardup,transit_snapshot_ivm"

if [ ! -f /tmp/bench_sf1_r11c.json ]; then
  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf1 SPARK_GRAFT_ONLY="$FRESH" \
    $RUN -Xmx48g graft.Bench > /tmp/bench_sf1_r11c.out \
    2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf1_r11c.progress)
  cp target/bench.json /tmp/bench_sf1_r11c.json
fi

if [ ! -f /tmp/bench_sf10_r11c.json ]; then
  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf10 SPARK_GRAFT_ONLY="$FRESH" \
    $RUN -Xmx96g graft.Bench > /tmp/bench_sf10_r11c.out \
    2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf10_r11c.progress)
  cp target/bench.json /tmp/bench_sf10_r11c.json
fi

python3 tools/scaling.py /tmp/bench_sf1_r11c.json \
  /tmp/bench_sf10_r11c.json reports/scaling_sf10_r11.json
echo "rehearsal2 done"
