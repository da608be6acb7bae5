#!/bin/bash
# Day-in-the-life composite soak (VERDICT r15 #4): streaming near-dup
# ingest + scheduled compaction under claims + retention + a sharded
# 2-driver DAG, all concurrent on one corpus, 30+ min, with a SIGKILL
# of the whole driver JVM mid-run. Usage:
#   scripts/daylife_soak.sh [sfDir] [nBatches] [batchSize] [root] [killAtApplied]
set -u
SFDIR="${1:-/root/testdata/sf0.1}"
NB="${2:-180}"
BS="${3:-100}"
ROOT="${4:-/tmp/graft_daylife}"
KILL_AT="${5:-60}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="$ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-16g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

T_START=$(date +%s)
echo "== stage ($SFDIR, $NB batches x $BS) =="
java $JOPTS -cp "$CP" graft.DayLife stage "$ROOT" "$SFDIR" "$NB" "$BS" 2>"/tmp/daylife.stage.err" | tail -1

echo "== drive #1 (SIGKILL at >= $KILL_AT applied batches) =="
java $JOPTS -cp "$CP" graft.DayLife drive "$ROOT" "$SFDIR" >"$ROOT/drive1.out" 2>"$ROOT/drive1.err" &
PID=$!
for i in $(seq 1 3600); do
  n=$(ls "$ROOT/index/applied" 2>/dev/null | wc -l)
  [[ "$n" -ge "$KILL_AT" ]] && break
  if ! kill -0 $PID 2>/dev/null; then echo "drive #1 exited early"; break; fi
  sleep 1
done
APPLIED_AT_KILL=$(ls "$ROOT/index/applied" 2>/dev/null | wc -l)
kill -9 $PID 2>/dev/null
wait $PID 2>/dev/null
echo "== SIGKILL at $APPLIED_AT_KILL applied batches =="

echo "== drive #2 (heal + resume to completion) =="
java $JOPTS -cp "$CP" graft.DayLife drive "$ROOT" "$SFDIR" >"$ROOT/drive2.out" 2>"$ROOT/drive2.err"
grep '"drive"' "$ROOT/drive2.out" | tail -1

echo "== verify (exact: probe==rebuild, DAG totals, retention bound) =="
java $JOPTS -cp "$CP" graft.DayLife verify "$ROOT" "$SFDIR" 2>"$ROOT/verify.err" | grep '"verify"'
RC=${PIPESTATUS[0]}
T_END=$(date +%s)
echo "total_wall_sec=$((T_END - T_START)) applied_at_kill=$APPLIED_AT_KILL"
echo "== event log (interleavings) =="
grep -c "compaction:" "$ROOT/daylife-events.log" | sed 's/^/  compaction passes: /'
grep -c "contention" "$ROOT/daylife-events.log" | sed 's/^/  claim contentions: /' || true
grep -c "ingest restart" "$ROOT/daylife-events.log" | sed 's/^/  ingest restarts: /' || true
exit $RC
