#!/bin/bash
# sf10 spot-check: the heaviest pipeline per family, measured at sf1 -> sf10
# (a second decade on top of the committed sf0.1 -> sf1 curve). Full-board
# sf10 would cost hours for no extra signal; the subset is the queries whose
# scale behavior the 100 TB claims actually rest on (candidate-pair joins,
# iterative fixpoints, wide aggs, the salted/skew join, ANN probes).
# Usage: bash tools/sf10_spotcheck.sh [classes_dir]
set -e
cd "$(dirname "$0")/.."
CLS="${1:-target/scala-2.13/classes}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUN="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CLS:/opt/spark/jars/*"

SUBSET="sim_nndescent,text_boilerplate,text_bpe_pretokens,text_contamination,dedup_semantic,dedup_embedding_neardup,dedup_minhash_pairs,dedup_clusters,dedup_dup_spans,dedup_soft_weights,sim_ann_ivf_persisted,sim_ood_knn,text_pii_redact,text_novelty,text_vocab_growth,transit_timetable_flat,transit_trip_patterns,transit_q2_weekday,transit_q4_weekday,rel_salted_join,rel_topk_per_group,mm_payload_neardup,transit_snapshot_ivm"

if [ ! -d /tmp/testdata_sf10 ]; then
  $RUN -Xmx24g graft.tools.InflateSf /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

# skip a leg whose artifact already exists (resumability: a killed sf10 leg
# must not force re-paying the sf1 leg)
if [ ! -f /tmp/bench_sf1_subset.json ]; then
  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf1 SPARK_GRAFT_ONLY="$SUBSET" \
    $RUN -Xmx48g graft.Bench > /tmp/bench_sf1_subset.out \
    2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf1_subset.progress)
  cp target/bench.json /tmp/bench_sf1_subset.json
fi

SPARK_GRAFT_SF_DIR=/tmp/testdata_sf10 SPARK_GRAFT_ONLY="$SUBSET" \
  $RUN -Xmx96g graft.Bench > /tmp/bench_sf10_subset.out \
  2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf10_subset.progress)
cp target/bench.json /tmp/bench_sf10_subset.json

python3 tools/scaling.py /tmp/bench_sf1_subset.json /tmp/bench_sf10_subset.json \
  reports/scaling_sf10_r10.json
