#!/bin/bash
# Eight-driver / 16-shard sharded soak with TWO OVERLAPPING kill windows
# (VERDICT r11 #10): B is SIGKILLed right after the chain starts and D is
# SIGKILLed moments later — D dies while B's failover is still being
# absorbed, so lease contention runs under real fan-out (eight claimants
# on every expired shard). The remaining six drivers finish the chain;
# verify recomputes the totals from the corpus (exact arithmetic).
# Usage: scripts/shard_soak8.sh [sfDir] [copies] [root]
set -u
SFDIR="${1:-/root/testdata/sf0.1}"
COPIES="${2:-20}"
ROOT="${3:-/tmp/graft_shard_soak8}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="$ADD_OPENS -Xmx4g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_SHARD_RING=16
export SPARK_GRAFT_SOAK_CPUS=4

rm -rf "$ROOT"; mkdir -p "$ROOT"
echo "== stage ($SFDIR x$COPIES, ring=16, 8 drivers) =="
java $JOPTS -cp "$CP" graft.ShardSoak stage "$ROOT" "$SFDIR" "$COPIES" 2>"$ROOT/stage.err" | tail -1

# SPARK_GRAFT_KV_BACKEND=http (VERDICT r16 #6): all shared state through
# a standalone conditional-PUT HTTP store — one server process, eight
# driver processes, every lease/WAL/inbox op a real socket round-trip
KV_PID=""
if [[ "${SPARK_GRAFT_KV_BACKEND:-}" == "http" ]]; then
  java $JOPTS -cp "$CP" graft.ShardSoak serve "$ROOT" >"$ROOT/kv.out" 2>&1 &
  KV_PID=$!
  for i in $(seq 1 100); do [[ -f "$ROOT/kv_endpoint" ]] && break; sleep 0.1; done
  echo "== kv store: $(cat "$ROOT/kv_endpoint") (pid $KV_PID) =="
fi

DRIVERS=(A B C D E F G H)
declare -A PIDS
for i in "${!DRIVERS[@]}"; do
  d="${DRIVERS[$i]}"
  s0=$((2 * i)); s1=$((2 * i + 1))
  java $JOPTS -cp "$CP" graft.ShardSoak drive "$ROOT" "$d" "$s0,$s1" \
    >"$ROOT/$d.out" 2>&1 &
  PIDS[$d]=$!
done
echo "== launched 8 drivers (2 home shards each) =="

for i in $(seq 1 600); do
  ok=1
  for d in "${DRIVERS[@]}"; do [[ -f "$ROOT/ready-$d" ]] || ok=0; done
  [[ $ok -eq 1 ]] && break; sleep 0.2
done
T0=$(date +%s%3N)
touch "$ROOT/go"
echo "== go =="

count() { cat "$ROOT"/events-*.log 2>/dev/null | grep -c "completed " || true; }

# kill window 1: B dies as soon as the chain is demonstrably running
while [[ "$(count)" -lt 1 ]]; do
  kill -0 "${PIDS[A]}" 2>/dev/null || { echo "A died early"; break; }
  sleep 0.2
done
T_KB=$(date +%s%3N)
kill -9 "${PIDS[B]}" 2>/dev/null
echo "== killed B at +$((T_KB - T0))ms after $(count) completions =="

# kill window 2 OVERLAPS B's recovery: D dies one completion later,
# within B's 5 s lease-expiry window
while [[ "$(count)" -lt 2 ]]; do
  kill -0 "${PIDS[A]}" 2>/dev/null || { echo "A died early"; break; }
  sleep 0.1
done
T_KD=$(date +%s%3N)
kill -9 "${PIDS[D]}" 2>/dev/null
echo "== killed D at +$((T_KD - T0))ms after $(count) completions (B->D gap $((T_KD - T_KB))ms) =="

RC=0
for d in A C E F G H; do
  wait "${PIDS[$d]}"; rc=$?
  [[ $rc -ne 0 ]] && { echo "driver $d exited rc=$rc"; RC=$rc; }
done
T_DONE=$(date +%s%3N)
echo "== survivors done; total=$((T_DONE - T0))ms; lastkill->done=$((T_DONE - T_KD))ms =="

echo "== event timeline =="
sort -n "$ROOT"/events-*.log | awk -v t0="$T0" '{printf "%+8.1fs %s\n", ($1-t0)/1000.0, substr($0, index($0,"\t")+1)}' | tail -30

echo "== verify =="
java $JOPTS -cp "$CP" graft.ShardSoak verify "$ROOT" 2>"$ROOT/verify.err" | tail -1
VRC=${PIPESTATUS[0]}
if [[ -n "$KV_PID" ]]; then touch "$ROOT/kv_stop"; wait "$KV_PID" 2>/dev/null; fi
exit $((RC + VRC))
