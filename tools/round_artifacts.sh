#!/bin/bash
# Round-10 artifact refresh: run after the final operator lands.
#  1. full-board bench at sf0.01 and sf0.1 (writes reports/bench_full.json)
#  2. scaling_r10.json  (sf0.01 -> sf0.1, full board)
#  3. scaling_sf1_r10.json (sf0.1 -> sf1, full board; sf1 data inflated
#     on demand under /tmp/testdata_sf1)
# Usage: bash tools/r9_artifacts.sh [classes_dir]
set -e
cd "$(dirname "$0")/.."
CLS="${1:-target/scala-2.13/classes}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUN="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CLS:/opt/spark/jars/*"

if [ ! -d /tmp/testdata_sf1 ]; then
  $RUN -Xmx16g graft.tools.InflateSf /root/testdata/sf0.1 /tmp/testdata_sf1 10
fi

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 $RUN -Xmx16g graft.Bench > /tmp/bench_001.out 2>/dev/null
cp target/bench.json reports/bench_sf001.json

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $RUN -Xmx32g graft.Bench > /tmp/bench_01.out 2>/dev/null
# graft.Bench already wrote reports/bench_full.json (the sf0.1 artifact)

SPARK_GRAFT_SF_DIR=/tmp/testdata_sf1 SPARK_GRAFT_ONLY="" $RUN -Xmx48g graft.Bench > /tmp/bench_sf1.out 2>/dev/null
cp target/bench.json reports/bench_sf1.json

python3 tools/scaling.py reports/bench_sf001.json reports/bench_full.json reports/scaling_r10.json
python3 tools/scaling.py reports/bench_full.json reports/bench_sf1.json reports/scaling_sf1_r10.json
