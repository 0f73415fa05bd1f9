#!/bin/bash
# Round-11 flag adjudication: solo warm re-profiles (own JVM per query per
# scale) for the four >10x sf1->sf10 flags from the clean-data rehearsal,
# using the repetition-GC bench (Bench.runOnce quiesces before EVERY timed
# run, so a prior repetition's eager localCheckpoint blocks cannot bill
# their eviction/spill to the warm numbers — the warm>cold signature
# dedup_dup_spans and transit_mongo_export showed in the full-board leg).
# Usage: nohup bash tools/r11_solo_flags.sh > /tmp/r11_solo_flags.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
CLS="${1:-target/scala-2.13/classes}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
RUN="java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CLS:/opt/spark/jars/*"

for q in transit_mongo_export dedup_dup_spans transit_stop_rules sim_ood_knn; do
  for sf in sf1 sf10; do
    dir=/tmp/testdata_$sf
    mem=$([ $sf = sf10 ] && echo 96g || echo 48g)
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_ONLY="$q" \
      $RUN -Xmx$mem graft.Bench > /tmp/solo_flag_${q}_${sf}.out 2>/dev/null
    cp target/bench.json /tmp/solo_flag_${q}_${sf}.json
    echo "[solo] $q $sf: $(cat /tmp/solo_flag_${q}_${sf}.json)"
  done
done
echo "solo flags done"
