#!/bin/bash
# cache_ab_bench.sh [PREFIX] — the round-7 verdict's cache-lifecycle
# experiment: run the full sf0.1 suite twice back-to-back in one quiet
# window — cache KEPT across queries (Bench default) vs cleared per query
# (SPARK_GRAFT_BENCH_CLEAR_CACHE=1) — so the kept-cache mode's win is
# (re)measured on the same host conditions, and heap/CacheManager growth
# across ~220 query executions is observable via storage_peak_bytes and
# the per-query steal/second traces. Run AFTER a clean quiet_bench record
# lands (this is diagnostics, not the headline record).
set -u
PREFIX=${1:-/tmp/cacheab}
cd /root/repo
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)
rm -rf "$PREFIX.classes"; cp -r target/scala-2.13/classes "$PREFIX.classes"
for mode in kept cleared; do
  env=""
  [ "$mode" = cleared ] && env="SPARK_GRAFT_BENCH_CLEAR_CACHE=1"
  echo "$(date -u +%F_%T) cache_ab: $mode start" >> "$PREFIX.log"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $env \
    java -Xmx8g $ADDOPENS -cp "$PREFIX.classes:/opt/spark/jars/*" graft.Bench \
    > "$PREFIX.$mode.json" 2> "$PREFIX.$mode.err"
  echo "$(date -u +%F_%T) cache_ab: $mode rc=$? $(grep -o '"value":[0-9.]*' "$PREFIX.$mode.json" | head -1)" >> "$PREFIX.log"
done
