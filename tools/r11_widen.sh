#!/bin/bash
# Round-11 third-decade WIDENING: the next-24 heaviest sf1 pipelines not yet
# covered by the 43-pipeline clean rehearsal (reports/scaling_sf10_r11.json),
# ranked by sf1 warm time from reports/bench_sf1.json. With these the decade
# covers 67 pipelines — every face above ~5 s sf1-warm, i.e. the queries
# whose 100 TB claims carry real weight (the remaining ~230 are sub-5 s
# faces whose scale story the complete sf0.01->sf1 curves already bound).
#
# The sf1 (small) leg reuses the round's full-board run
# (/tmp/bench_sf1_full_r11.json — same JVM config, GC-quiesced, min-of-2
# warm); only the sf10 leg is paid here. Merging into the standing report
# preserves the 43 existing rows and their embedded solo verdicts.
# Usage: nohup bash tools/r11_widen.sh > /tmp/r11_widen.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
CLS="${1:-target/scala-2.13/classes}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUN="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CLS:/opt/spark/jars/*"

NEXT24="transit_assortativity,transit_lp_communities,transit_stress,transit_khop_census,transit_pagerank,transit_q2_snapshot,transit_stop_pairs,transit_pagerank_k3,transit_core_layers,transit_link_prediction,dedup_apply_near,transit_q2_detail,transit_triangles,transit_q2_week,dedup_canonical,dedup_lsh_recall,text_lang_id,dedup_prefix_filter,sim_ann_ivfpq,transit_service_span,sim_ann_ivf,rel_expectations,rel_agg,sim_ann_ivf_nprobe"

if [ ! -d /tmp/testdata_sf10 ]; then
  $RUN -Xmx24g graft.tools.InflateSf /tmp/testdata_sf1 /tmp/testdata_sf10 10
fi

if [ ! -f /tmp/bench_sf10_widen.json ]; then
  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf10 SPARK_GRAFT_ONLY="$NEXT24" \
    $RUN -Xmx96g graft.Bench > /tmp/bench_sf10_widen.out \
    2> >(grep --line-buffered '^\[bench\]' > /tmp/bench_sf10_widen.progress)
  cp target/bench.json /tmp/bench_sf10_widen.json
fi

python3 tools/scaling.py /tmp/bench_sf1_full_r11.json \
  /tmp/bench_sf10_widen.json /tmp/scaling_sf10_widen.json

# union the new rows into the standing report (existing rows win on
# conflict — they carry the embedded solo verdicts); flagged[] keeps the
# standing convention: every ratio>threshold name, adjudicated or not
# (verdicts.solo explains the adjudicated ones)
python3 - <<'EOF'
import json
std = json.load(open("reports/scaling_sf10_r11.json"))
new = json.load(open("/tmp/scaling_sf10_widen.json"))
for k, v in new["queries"].items():
    std["queries"].setdefault(k, v)
thr = std["flag_threshold"]
std["flagged"] = sorted(
    [k for k, v in std["queries"].items()
     if v.get("ratio") and v["ratio"] > thr],
    key=lambda k: -std["queries"][k]["ratio"])
std["widened_with"] = "tools/r11_widen.sh next-24 (sf1 leg = full-board run)"
json.dump(std, open("reports/scaling_sf10_r11.json", "w"), indent=1, sort_keys=True)
adj = set(std.get("verdicts", {}).get("solo", {}))
print("merged:", len(std["queries"]), "queries; flags needing adjudication:",
      [f for f in std["flagged"] if f not in adj])
EOF
echo "widen done"
