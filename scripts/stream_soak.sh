#!/bin/bash
# Sustained streaming near-dup ingest soak with mid-stream SIGKILL
# (VERDICT r11 #7). Usage: scripts/stream_soak.sh [sfDir] [nBatches] [batchSize] [root]
set -u
SFDIR="${1:-/root/testdata/sf0.1}"
NB="${2:-100}"
BS="${3:-100}"
ROOT="${4:-/tmp/graft_stream_soak}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="$ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-12g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

echo "== stage ($SFDIR, $NB batches x $BS) =="
java $JOPTS -cp "$CP" graft.StreamSoak stage "$ROOT" "$SFDIR" "$NB" "$BS" 2>"$ROOT.stage.err" | tail -1

echo "== drive #1 (will be SIGKILLed mid-stream) =="
java $JOPTS -cp "$CP" graft.StreamSoak drive "$ROOT" >"$ROOT/drive1.out" 2>"$ROOT/drive1.err" &
PID=$!
HALF=$((NB / 2))
for i in $(seq 1 1200); do
  n=$(ls "$ROOT/index/applied" 2>/dev/null | wc -l)
  [[ "$n" -ge "$HALF" ]] && break
  sleep 0.5
done
T0=$(date +%s%3N)
kill -9 $PID
wait $PID 2>/dev/null
APPLIED_AT_KILL=$(ls "$ROOT/index/applied" | wc -l)
echo "== SIGKILL at $APPLIED_AT_KILL applied batches =="

echo "== drive #2 (resume from checkpoint) =="
java $JOPTS -cp "$CP" graft.StreamSoak drive "$ROOT" >"$ROOT/drive2.out" 2>"$ROOT/drive2.err"
T1=$(date +%s%3N)
echo "resume_wall_ms=$((T1 - T0))"

echo "== verify (final index vs from-scratch rebuild) =="
java $JOPTS -cp "$CP" graft.StreamSoak verify "$ROOT" "$SFDIR" 2>"$ROOT/verify.err" | tail -1
RC=${PIPESTATUS[0]}

echo "== per-batch cost (first/last 10 of drive #1+#2, trigger ms) =="
grep -h '"batch"' "$ROOT/drive1.out" "$ROOT/drive2.out" | grep -v '"rows":0' > "$ROOT/batches.jsonl"
head -10 "$ROOT/batches.jsonl" | sed 's/^/  first: /'
tail -10 "$ROOT/batches.jsonl" | sed 's/^/  last:  /'
exit $RC
