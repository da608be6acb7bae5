#!/bin/bash
# Standing 10x-scale gate (VERDICT r16 Next #1): scale sf0.1 up 10x with
# graft.ScaleUp, run the FULL driver contract (graft.Verify) on the scaled
# tables, and DuckDB-replay every oracle with tools/selfcheck.py. Catches
# what sf0.01 cannot: quadratic frames, bucket-cap/broadcast constants,
# fixture stride collisions, scan-granularity serialization.
#
# Staging dirs are fingerprint-keyed (Framework.work), so re-running
# against REGENERATED sf data needs no manual /tmp clearing.
#
# Usage: scripts/sf1_gate.sh [srcSfDir] [factor] [workRoot]
# Exit 0 = all queries match their oracles at 10x.
set -u
SRC="${1:-/root/testdata/sf0.1}"
FACTOR="${2:-10}"
WROOT="${3:-/tmp/graft_sf1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="$ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
CPUS="${SPARK_GRAFT_CPUS:-16}"
OUT="$WROOT/verify_out"

T0=$(date +%s)
echo "== ScaleUp $SRC -> $WROOT/data (x$FACTOR) =="
java $JOPTS -cp "$CP" graft.ScaleUp "$SRC" "$WROOT/data" "$FACTOR" \
  2>"$WROOT.scaleup.err" | tail -2 || { echo "ScaleUp FAILED"; exit 1; }

T1=$(date +%s)
echo "== Verify (full contract, local[$CPUS]) =="
rm -rf "$OUT"
SPARK_GRAFT_CPUS="$CPUS" java $JOPTS -cp "$CP" \
  graft.Verify "$WROOT/data" "$OUT" 2>"$WROOT.verify.err" | tail -3

T2=$(date +%s)
echo "== selfcheck (DuckDB oracle replay) =="
python3 "$REPO/tools/selfcheck.py" "$WROOT/data" "$OUT"
RC=$?
T3=$(date +%s)
echo "sf1_gate: scaleup=$((T1-T0))s verify=$((T2-T1))s oracle=$((T3-T2))s total=$((T3-T0))s exit=$RC"
exit $RC
