#!/bin/bash
# Round-11 sf10 rehearsal widening (VERDICT r10 asks #5/#7/#8):
#  - the NEXT 20 heaviest pipelines by sf1 warm time join the standing
#    r10 subset (23) -> >= 40 pipelines with a measured sf1 -> sf10 decade
#  - the three round-11-changed queries (timetable_flat, dup_spans,
#    contamination) get FRESH legs at both scales (their r10 numbers are
#    stale); the unchanged 20 reuse the committed r10 legs
#  - merge -> reports/scaling_sf10_r11.json
# Usage: nohup bash tools/r11_rehearsal.sh > /tmp/r11_rehearsal.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
CLS="${1:-target/scala-2.13/classes}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUN="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CLS:/opt/spark/jars/*"

# next-20 heaviest by reports/bench_sf1.json warm, excluding the r10 subset
NEW20="transit_mongo_export,transit_gtfs_validation_roundtrip,transit_gtfs_q4,text_lm_score,transit_feed_upsert,rel_try_ops,transit_gtfs_corrupt,transit_stop_pmi,transit_od_corridors,text_fingerprint,transit_q4_snapshot,transit_q4_nested_map,transit_q4_nested,transit_stop_rules,transit_stop_trigrams,transit_q4_week,transit_walk_corpus,transit_clustering_coef,text_repetition,transit_isochrone"
CHANGED3="transit_timetable_flat,dedup_dup_spans,text_contamination"
FRESH="$NEW20,$CHANGED3"

if [ ! -d /tmp/testdata_sf10 ]; then
  $RUN -Xmx24g graft.tools.InflateSf /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

if [ ! -f /tmp/bench_sf1_new_r11.json ]; then
  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf1 SPARK_GRAFT_ONLY="$FRESH" \
    $RUN -Xmx48g graft.Bench > /tmp/bench_sf1_new_r11.out \
    2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf1_new_r11.progress)
  cp target/bench.json /tmp/bench_sf1_new_r11.json
fi

if [ ! -f /tmp/bench_sf10_new_r11.json ]; then
  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf10 SPARK_GRAFT_ONLY="$FRESH" \
    $RUN -Xmx96g graft.Bench > /tmp/bench_sf10_new_r11.out \
    2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf10_new_r11.progress)
  cp target/bench.json /tmp/bench_sf10_new_r11.json
fi

# merge: fresh legs override the r10 subset legs for the changed queries
python3 - <<'EOF'
import json
def load(p): return json.load(open(p))
def merge(base, fresh):
    q = dict(load(base)["queries"]); q.update(load(fresh)["queries"])
    return q
for scale, base, fresh, out in (
    ("sf1", "/tmp/bench_sf1_subset.json", "/tmp/bench_sf1_new_r11.json",
     "/tmp/bench_sf1_r11_merged.json"),
    ("sf10", "/tmp/bench_sf10_subset.json", "/tmp/bench_sf10_new_r11.json",
     "/tmp/bench_sf10_r11_merged.json")):
    d = load(base); d["queries"] = merge(base, fresh)
    d["sf"] = "/tmp/testdata_%s" % scale
    json.dump(d, open(out, "w"))
    print(out, len(d["queries"]), "queries")
EOF

python3 tools/scaling.py /tmp/bench_sf1_r11_merged.json \
  /tmp/bench_sf10_r11_merged.json reports/scaling_sf10_r11.json
echo "rehearsal done"
