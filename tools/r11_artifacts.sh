#!/bin/bash
# Round-11 artifact refresh: run after the final operator lands (and after
# tools/r11_rehearsal.sh finished — they share the box).
#  1. full-board bench at sf0.01, sf0.1 (writes reports/bench_full.json), sf1
#  2. scaling_r11.json      (sf0.01 -> sf0.1, full board)
#  3. scaling_sf1_r11.json  (sf0.1 -> sf1, full board)
# Usage: nohup bash tools/r11_artifacts.sh > /tmp/r11_artifacts.log 2>&1 &
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

python3 tools/scaling.py reports/bench_sf001.json reports/bench_full.json reports/scaling_r11.json
python3 tools/scaling.py reports/bench_full.json reports/bench_sf1.json reports/scaling_sf1_r11.json
echo "artifacts done"
