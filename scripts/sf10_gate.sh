#!/bin/bash
# Standing 100x-scale gate (VERDICT r18 Next #2): the r18 sf10 run proved
# the full contract at 100x but took hand-set env knobs and two manual
# oracle substitutions; this makes it ONE command. Scales sf0.1 up 100x
# with graft.ScaleUp, runs the FULL driver contract (graft.Verify), then
# replays every oracle: all standard rows through tools/selfcheck.py (with the
# DuckDB big-SF presets that the r18 run learned the hard way — the
# default 80%-of-RAM cap OOM-killed a 60M-row join oracle, and cwd-
# relative temp spill orphaned 49 GB), and the 2 rows whose naive oracles
# are quadratic-infeasible at this scale (p06, p07) through
# tools/bigsf_oracles.py's documented substitute replays (identity-form /
# replication-structure — see that file's header).
#
# CADENCE: once per round, on the final tree, after the sf0.01 gate is
# green — ledger the "N/N effective" line in BASELINE.md (121 rows as
# of r19: 119 standard + 2 substitute).
#
# Usage: scripts/sf10_gate.sh [srcSfDir] [factor] [workRoot]
# Exit 0 = every row matches (standard + the 2 substitutes).
set -u
SRC="${1:-/root/testdata/sf0.1}"
FACTOR="${2:-100}"
WROOT="${3:-/tmp/graft_sf10}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# Heap sized per the r18 sf100 lesson: leave the OS page cache room for
# the dataset + shuffle files — more heap is not more speed once the
# scan path goes cold.
JOPTS="$ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-80g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
CPUS="${SPARK_GRAFT_CPUS:-24}"
OUT="$WROOT/verify_out"
export GRAFT_DUCKDB_MEMORY="${GRAFT_DUCKDB_MEMORY:-48GB}"
export GRAFT_DUCKDB_TEMP="${GRAFT_DUCKDB_TEMP:-$WROOT/duck_tmp}"

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
echo "== selfcheck (DuckDB oracle replay, standard rows) =="
GRAFT_SELFCHECK_EXCLUDE="p06_label_affinity,p07_minhash_lsh" \
  python3 "$REPO/tools/selfcheck.py" "$WROOT/data" "$OUT"
RC1=$?
T3=$(date +%s)
echo "== bigsf_oracles (substitute replays: p06 identity, p07 replication) =="
python3 "$REPO/tools/bigsf_oracles.py" "$SRC" "$WROOT/data" "$OUT" "$FACTOR"
RC2=$?
T4=$(date +%s)
rm -rf "$GRAFT_DUCKDB_TEMP"
RC=$(( RC1 != 0 || RC2 != 0 ? 1 : 0 ))
echo "sf10_gate: scaleup=$((T1-T0))s verify=$((T2-T1))s oracle=$((T3-T2))s subs=$((T4-T3))s total=$((T4-T0))s exit=$RC"
exit $RC
