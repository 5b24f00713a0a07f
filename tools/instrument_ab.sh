#!/bin/bash
# instrument_ab.sh [PREFIX] — the r12-verdict "make the driver's bench
# instrument read true" experiment: run the FULL sf0.1 suite twice
# back-to-back in one window —
#   fixed : family run order + clearCache/System.gc() at family
#           boundaries (the new Bench default: the chunk runner's
#           context reproduced in one JVM), vs
#   legacy: alphabetical order, no boundary clears (the exact r12
#           driver instrument: SPARK_GRAFT_BENCH_ORDER=alpha
#           SPARK_GRAFT_BENCH_FAMILY_CLEAR=0).
# Success = fixed lands within ~1.15x of the chunked-record sum while
# legacy shows the familiar inflation on the same host conditions.
# Both records carry per-query steal, so a co-tenant burst in one leg
# is visible rather than fatal.
set -u
PREFIX=${1:-/tmp/instab}
SF_DIR=${SF_DIR:-/root/testdata/sf0.1}
cd /root/repo
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)
rm -rf "$PREFIX.classes"; cp -r target/scala-2.13/classes "$PREFIX.classes"
for mode in fixed legacy; do
  env=""
  [ "$mode" = legacy ] && env="SPARK_GRAFT_BENCH_ORDER=alpha SPARK_GRAFT_BENCH_FAMILY_CLEAR=0"
  echo "$(date -u +%F_%T) instrument_ab: $mode start" >> "$PREFIX.log"
  SPARK_GRAFT_SF_DIR="$SF_DIR" env $env \
    java -Xmx8g $ADDOPENS -cp "$PREFIX.classes:/opt/spark/jars/*" graft.Bench \
    > "$PREFIX.$mode.json" 2> "$PREFIX.$mode.err"
  echo "$(date -u +%F_%T) instrument_ab: $mode rc=$? $(grep -o '"value":[0-9.]*' "$PREFIX.$mode.json" | head -1) steal=$(grep -o '"suite_steal_cores":"[0-9.]*"' "$PREFIX.$mode.json" | head -1)" >> "$PREFIX.log"
done
