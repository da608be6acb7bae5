#!/bin/bash
# Two-OS-process sharded-driver soak with SIGKILL failover (VERDICT r10 #4).
# Usage: scripts/shard_soak.sh [sfDir] [copies] [root]
set -u
SFDIR="${1:-/root/testdata/sf0.1}"
COPIES="${2:-100}"
ROOT="${3:-/tmp/graft_shard_soak}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="$ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

rm -rf "$ROOT"; mkdir -p "$ROOT"
echo "== stage ($SFDIR x$COPIES) =="
java $JOPTS -cp "$CP" graft.ShardSoak stage "$ROOT" "$SFDIR" "$COPIES" 2>"$ROOT/stage.err" | tail -1

echo "== launch drivers A(0,1) B(2,3) =="
java $JOPTS -cp "$CP" graft.ShardSoak drive "$ROOT" A 0,1 >"$ROOT/A.out" 2>&1 &
PID_A=$!
java $JOPTS -cp "$CP" graft.ShardSoak drive "$ROOT" B 2,3 >"$ROOT/B.out" 2>&1 &
PID_B=$!

for i in $(seq 1 300); do
  [[ -f "$ROOT/ready-A" && -f "$ROOT/ready-B" ]] && break; sleep 0.2
done
T0=$(date +%s%3N)
touch "$ROOT/go"
echo "== go (t0=$T0) =="

# kill A once the chain is demonstrably split-executing (>=3 completions)
while true; do
  N=$(cat "$ROOT"/events-*.log 2>/dev/null | grep -c "completed " || true)
  if [[ "$N" -ge 3 ]]; then break; fi
  if ! kill -0 $PID_B 2>/dev/null; then echo "B died early"; break; fi
  sleep 0.2
done
T_KILL=$(date +%s%3N)
kill -9 $PID_A 2>/dev/null
echo "== killed A at +$(( (T_KILL - T0) ))ms after $N completions =="

wait $PID_B; RC_B=$?
T_DONE=$(date +%s%3N)
echo "== B exited rc=$RC_B; total=$((T_DONE - T0))ms; kill->done=$((T_DONE - T_KILL))ms =="

echo "== event timeline =="
sort -n "$ROOT"/events-*.log | awk -v t0="$T0" -v tk="$T_KILL" '{printf "%+8.1fs %s %s\n", ($1-t0)/1000.0, ($1>tk?"[post-kill]":"          "), substr($0, index($0,"\t")+1)}'

echo "== verify =="
# capture the JVM's exit code, not tail's — a failed verification must
# fail the soak
VOUT=$(java $JOPTS -cp "$CP" graft.ShardSoak verify "$ROOT" 2>"$ROOT/verify.err")
RC_V=$?
echo "$VOUT" | tail -1
exit $RC_V
