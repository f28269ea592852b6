#!/bin/bash
# QUERY-side weak scaling on local-cluster[W,C,M]: batch retrieval
# (Search.topKBatch, ONE job for the whole query set) at 1 worker over
# corpus/4 vs 4 workers over the full corpus, SAME query set — every
# query touches 4x the shards at the high level, so ideal scaling is
# EQUAL wall clock (eff = wall_low / wall_high). Same discipline as
# tools/cluster_weak.sh: fresh cluster per sample, config-B executor
# JVMs sized to their core budget, external taskset pinning, rounds
# interleaved across levels, per-level MINIMA.
set -u
cd /root/repo
# defaults REPRODUCE the BENCH/BASELINE.md §0c record (3 harness
# rounds x 4 timed passes of 3000 queries)
ROUNDS=${ROUNDS:-3}
NQ=${NQ:-3000}
LOG=${LOG:-/root/repo/BENCH/logs/cluster_query.log}
C16=/dev/shm/graft-corpus-1600k
C64=/dev/shm/graft-corpus-6400k
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR=/dev/shm/graft-spark/work
export SPARK_GRAFT_SHARDS_PER_CORE=${SPARK_GRAFT_SHARDS_PER_CORE:-8}
export SPARK_GRAFT_QROUNDS=${SPARK_GRAFT_QROUNDS:-4}
mkdir -p /dev/shm/graft-spark/work "$(dirname "$LOG")"
# always refresh the default frozen-classes copy — a stale dir from an
# earlier round would ClassNotFound the tool (or worse, silently
# benchmark old code); an explicit $FROZEN is the caller's to manage
if [ -z "${FROZEN:-}" ]; then
  FROZEN=/dev/shm/graft-frozen-classes
  rm -rf "$FROZEN"
  cp -r target/scala-2.13/classes "$FROZEN"
fi
. tools/jvm_opens.sh

. "$(dirname "$0")/pin_lib.sh"

run() {
  local w=$1 c=$2 mem=$3 corpus=$4 nhigh=$5 tag=$6; shift 6
  local sets=("$@")
  local pf=/dev/shm/graft-spark/pin_$tag
  rm -f "$pf"
  local drain=0
  while [ -n "$(graft_executors)" ]; do
    drain=$((drain+1)); [ $drain -gt 60 ] && break; sleep 1
  done
  # stale executors past the drain window would satisfy the pin loop and
  # steal the core assignments from the REAL executors: kill by pid
  for sp in $(graft_executors); do
    kill -9 "$sp" 2>/dev/null
  done
  SPARK_GRAFT_NHIGH=$nhigh SPARK_GRAFT_PINFILE=$pf \
  SPARK_GRAFT_CLASSES=$FROZEN \
  SPARK_GRAFT_EXEC_EXTRAOPTS="-Dgraft.harness=1 -XX:ActiveProcessorCount=$c -XX:ParallelGCThreads=$c" \
    java $ADDOPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$FROZEN:/opt/spark/jars/*" graft.tools.ClusterQuery $w $c $mem $corpus $NQ $tag \
    > /tmp/cq_$tag.out 2>&1 &
  local jpid=$!
  local tries=0
  local pids=()
  while true; do
    kill -0 "$jpid" 2>/dev/null || { echo "[clusterq] $tag: driver died early" >>"$LOG"; break; }
    mapfile -t pids < <(graft_executors | sort -n)
    [ "${#pids[@]}" -ge "$w" ] && break
    tries=$((tries+1))
    if [ $tries -gt 600 ]; then echo "[clusterq] $tag: executors never appeared" >>"$LOG"; break; fi
    sleep 0.5
  done
  # pin only when the EXPECTED executor set appeared: on early driver
  # death `pids` would be empty/stale, and a respawned extra backend
  # would wrap the core-set assignment onto a double-booked set
  if [ "${#pids[@]}" -ge "$w" ]; then
    local i=0
    for pid in "${pids[@]:0:$w}"; do
      taskset -a -p -c "${sets[$i]}" "$pid" >/dev/null 2>&1
      i=$(( (i+1) % ${#sets[@]} ))
    done
  fi
  local dpid
  dpid=$(pgrep -f "graft.tools.ClusterQuery" | head -1)
  [ -n "$dpid" ] && taskset -a -p -c 28-31 "$dpid" >/dev/null 2>&1
  touch "$pf"
  wait "$jpid"
  grep -hE "clusterquery. (tag|executors|setup)" /tmp/cq_$tag.out >>"$LOG"
}

echo "[clusterq] start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) nq=$NQ" >>"$LOG"
for r in $(seq 1 "$ROUNDS"); do
  echo "[clusterq] round $r $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  # Q1 (weak): 1x4 over 1.6M docs vs 4x4 over 6.4M docs, same NQ
  # queries. dps identical at both levels (low nhigh=4: 1.6M/(4*8)=50k;
  # high nhigh=16: 6.4M/(16*8)=50k), so per-task decode/score work is
  # the same shape everywhere — the high level just has 4x the shards.
  if [ "${PAIRS:-weak}" != "strong" ]; then
    run 1 4 9216 "$C16" 4  "Q1low_r$r"  0-3
    run 4 4 9216 "$C64" 16 "Q1high_r$r" 0-3 4-7 8-11 12-15
  fi
  # Q2 (strong): SAME 1.6M corpus and query set at both levels —
  # eff = wall_low / (4 * wall_high)
  if [ "${PAIRS:-weak}" = "strong" ] || [ "${PAIRS:-weak}" = "both" ]; then
    run 1 4 9216 "$C16" 4 "Q2low_r$r"  0-3
    run 4 4 9216 "$C16" 4 "Q2high_r$r" 0-3 4-7 8-11 12-15
  fi
done
echo "[clusterq] done $(date +%T)" >>"$LOG"
