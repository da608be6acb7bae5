#!/bin/bash
# Three-driver sharded soak with a DOUBLE failure: A and B are SIGKILLed
# at different points mid-chain and C alone finishes the DAG.
# Usage: scripts/shard_soak3.sh [sfDir] [copies] [root]
set -u
SFDIR="${1:-/root/testdata/sf0.1}"
COPIES="${2:-100}"
ROOT="${3:-/tmp/graft_shard_soak3}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="$ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_SHARD_RING=6
export SPARK_GRAFT_SOAK_CPUS=8

rm -rf "$ROOT"; mkdir -p "$ROOT"
echo "== stage ($SFDIR x$COPIES, ring=6) =="
java $JOPTS -cp "$CP" graft.ShardSoak stage "$ROOT" "$SFDIR" "$COPIES" 2>"$ROOT/stage.err" | tail -1

echo "== launch drivers A(0,1) B(2,3) C(4,5) =="
java $JOPTS -cp "$CP" graft.ShardSoak drive "$ROOT" A 0,1 >"$ROOT/A.out" 2>&1 &
PID_A=$!
java $JOPTS -cp "$CP" graft.ShardSoak drive "$ROOT" B 2,3 >"$ROOT/B.out" 2>&1 &
PID_B=$!
java $JOPTS -cp "$CP" graft.ShardSoak drive "$ROOT" C 4,5 >"$ROOT/C.out" 2>&1 &
PID_C=$!

for i in $(seq 1 300); do
  [[ -f "$ROOT/ready-A" && -f "$ROOT/ready-B" && -f "$ROOT/ready-C" ]] && break
  sleep 0.2
done
T0=$(date +%s%3N)
touch "$ROOT/go"
echo "== go =="

count() { cat "$ROOT"/events-*.log 2>/dev/null | grep -c "completed " || true; }

while [[ "$(count)" -lt 2 ]]; do
  if ! kill -0 $PID_C 2>/dev/null; then echo "C died early"; break; fi
  sleep 0.2
done
T_KA=$(date +%s%3N)
kill -9 $PID_A 2>/dev/null
echo "== killed A at +$((T_KA - T0))ms after $(count) completions =="

while [[ "$(count)" -lt 5 ]]; do
  if ! kill -0 $PID_C 2>/dev/null; then echo "C died early"; break; fi
  sleep 0.2
done
T_KB=$(date +%s%3N)
kill -9 $PID_B 2>/dev/null
echo "== killed B at +$((T_KB - T0))ms after $(count) completions =="

wait $PID_C; RC_C=$?
T_DONE=$(date +%s%3N)
echo "== C exited rc=$RC_C; total=$((T_DONE - T0))ms; lastkill->done=$((T_DONE - T_KB))ms =="

echo "== event timeline =="
sort -n "$ROOT"/events-*.log | awk -v t0="$T0" '{printf "%+8.1fs %s\n", ($1-t0)/1000.0, substr($0, index($0,"\t")+1)}'

echo "== verify =="
VOUT=$(java $JOPTS -cp "$CP" graft.ShardSoak verify "$ROOT" 2>"$ROOT/verify.err")
RC_V=$?
echo "$VOUT" | tail -1
exit $RC_V
