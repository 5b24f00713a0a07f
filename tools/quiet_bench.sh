#!/bin/bash
# quiet_bench.sh [PREFIX] [MAX_ATTEMPTS] — wait for a sustained-quiet CPU
# window (co-tenant steal < 0.5 cores and load1 < 2.0 for 60 s), then run
# the full graft.Bench suite at sf0.1. The Bench JSON carries its own
# per-query steal record; a run only counts as the clean record if the
# suite-wide steal stayed < 0.8 cores, no per-query window exceeded 1.5
# cores, and no query DNF'd. Retries until clean or MAX_ATTEMPTS.
#
# Round-8 context: four round-7 runs and the first round-8 run were all
# polluted by co-tenant bursts (2x-80x per-query inflation, 120 s DNFs of
# 2-second queries). This runner exists so a human never has to babysit
# the host for a measurement window again.
set -u
PREFIX=${1:-/tmp/qbench}
MAX=${2:-12}
cd /root/repo
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)

steal_sample() { # 5-second steal-cores + load1 sample
  local s1 t1 s2 t2
  read -r s1 t1 < <(awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat)
  sleep 5
  read -r s2 t2 < <(awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat)
  awk -v a=$((s2-s1)) -v b=$((t2-t1)) -v l="$(cut -d' ' -f1 /proc/loadavg)" \
    'BEGIN{printf "%.2f %s\n", (b>0)? a/b*32 : 99, l}'
}

for i in $(seq 1 "$MAX"); do
  quiet=0
  while [ $quiet -lt 12 ]; do
    read -r sc l1 < <(steal_sample)
    ok=$(awk -v s="$sc" -v l="$l1" 'BEGIN{print (s<0.5 && l<2.0)?1:0}')
    if [ "$ok" = 1 ]; then quiet=$((quiet+1)); else quiet=0; fi
  done
  echo "$(date -u +%F_%T) attempt $i: quiet window, launching" >> "$PREFIX.log"
  # snapshot classes so a concurrent sbt compile can't hand the JVM a torn build
  rm -rf "$PREFIX.classes"; cp -r target/scala-2.13/classes "$PREFIX.classes"
  touch "$PREFIX.running"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    java -Xmx8g $ADDOPENS -cp "$PREFIX.classes:/opt/spark/jars/*" graft.Bench \
    > "$PREFIX.$i.json" 2> "$PREFIX.$i.err"
  rc=$?
  rm -f "$PREFIX.running"
  verdict=$(python3 - "$PREFIX.$i.json" <<'EOF'
import json,sys
try: d=json.loads(open(sys.argv[1]).readline())
except Exception: print("badjson"); raise SystemExit
qs=d.get("queries",{})
dnf=[k for k,v in qs.items() if v<0]
hot=[k for k,v in d.get("steal_cores",{}).items() if v>1.5]
ok=d.get("status")=="complete" and not dnf and d.get("suite_steal_cores",99)<0.8 and not hot
print("clean" if ok else "dirty dnf=%s hot=%s suite=%s"%(dnf,hot,d.get("suite_steal_cores")))
EOF
)
  echo "$(date -u +%F_%T) attempt $i rc=$rc $verdict" >> "$PREFIX.log"
  case "$verdict" in clean*) cp "$PREFIX.$i.json" "$PREFIX.clean.json"; exit 0;; esac
  sleep 60
done
exit 1
