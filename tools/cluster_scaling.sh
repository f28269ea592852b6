#!/bin/bash
# N -> 4N EXECUTOR scaling on local-cluster[W,C,M]: W separate executor
# JVMs, each pinned (taskset -a -p) to its OWN core set and sized
# (-XX:ActiveProcessorCount=C, ParallelGC threads) for exactly C cores —
# the faithful small-cluster emulation this sandbox allows: per-"node"
# heap, GC, JIT and cores are private; only DRAM is shared (bounded by
# the memcopy platform control, BENCH/BASELINE.md §2a).
#
# Pairs (interleaved rounds, per-level minima like tools/pinned_scaling.sh):
#   E1: 1x2 vs 4x2 executors, 800k docs  (2 -> 8 cores, in-envelope)
#   E2: 1x4 vs 4x4 executors, 1.6M docs  (4 -> 16 cores)
# The driver JVM is pinned to cores 28-31 at EVERY level (it only
# schedules; keeping it off the executor cores removes the low-level
# subsidy the single-JVM record had to argue around).
set -u
cd /root/repo
ROUNDS=${ROUNDS:-4}
LOG=${LOG:-/root/repo/BENCH/logs/cluster_scaling.log}
C8=/dev/shm/graft-corpus-800k
C16=/dev/shm/graft-corpus-1600k
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR=/dev/shm/graft-spark/work
mkdir -p /dev/shm/graft-spark/work "$(dirname "$LOG")"
# frozen classpath: the measurement must not race source edits/recompiles
FROZEN=${FROZEN:-/dev/shm/graft-frozen-classes}
rm -rf "$FROZEN"
cp -r target/scala-2.13/classes "$FROZEN"
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)

. "$(dirname "$0")/pin_lib.sh"

# run <workers> <coresPerWorker> <memMB> <corpus> <nhigh> <tag> <coreSets...>
run() {
  local w=$1 c=$2 mem=$3 corpus=$4 nhigh=$5 tag=$6; shift 6
  local sets=("$@")
  local pf=/dev/shm/graft-spark/pin_$tag
  rm -f "$pf"
  # previous run's executors must be fully gone before counting new ones
  local drain=0
  while [ -n "$(graft_executors)" ]; do
    drain=$((drain+1)); [ $drain -gt 60 ] && break; sleep 1
  done
  # stale executors surviving the drain window would satisfy the pin loop
  # and double-book core sets with the REAL executors (ADVICE r04): kill
  # leftovers by pid (harness-scoped, see graft_executors)
  local sp
  for sp in $(graft_executors); do
    kill -9 "$sp" 2>/dev/null
  done
  SPARK_GRAFT_NHIGH=$nhigh SPARK_GRAFT_PINFILE=$pf \
  SPARK_GRAFT_CLASSES=$FROZEN \
  SPARK_GRAFT_EXEC_EXTRAOPTS="-Dgraft.harness=1 -XX:ActiveProcessorCount=$c -XX:ParallelGCThreads=$c" \
    java $ADDOPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$FROZEN:/opt/spark/jars/*" graft.tools.ClusterBuild $w $c $mem $corpus $tag \
    > /tmp/cb_$tag.out 2>&1 &
  local sbtpid=$!
  # wait for all W executor JVMs, then pin each to its own core set
  local tries=0
  while true; do
    mapfile -t pids < <(graft_executors | sort -n)
    [ "${#pids[@]}" -ge "$w" ] && break
    tries=$((tries+1))
    if [ $tries -gt 600 ]; then echo "[cluster] $tag: executors never appeared" >>"$LOG"; break; fi
    sleep 0.5
  done
  # pin only when the EXPECTED executor set appeared, and only the first
  # W pids (one per core set) - the old modulo wrap silently double-booked
  # core sets when an extra backend matched (ADVICE r04)
  if [ "${#pids[@]}" -ge "$w" ]; then
    local i
    for ((i = 0; i < w; i++)); do
      taskset -a -p -c "${sets[$i]}" "${pids[$i]}" >/dev/null 2>&1
    done
  else
    echo "[cluster] $tag: pin skipped (${#pids[@]}/$w executors)" >>"$LOG"
  fi
  # driver = the forked java running ClusterBuild
  local dpid
  dpid=$(pgrep -f "graft.tools.ClusterBuild" | head -1)
  [ -n "$dpid" ] && taskset -a -p -c 28-31 "$dpid" >/dev/null 2>&1
  touch "$pf"
  wait "$sbtpid"
  grep -hE "clusterbuild. (tag|executors)" /tmp/cb_$tag.out >>"$LOG"
}

echo "[cluster] start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
for r in $(seq 1 "$ROUNDS"); do
  echo "[cluster] round $r $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  run 1 1 7168 "$C8" 4 "E0low_r$r"  0
  run 4 1 7168 "$C8" 4 "E0high_r$r" 0 1 2 3
  run 1 2 7168 "$C8" 8 "E1low_r$r"  0-1
  run 4 2 7168 "$C8" 8 "E1high_r$r" 0-1 2-3 4-5 6-7
  run 1 4 9216 "$C16" 16 "E2low_r$r"  0-3
  run 4 4 9216 "$C16" 16 "E2high_r$r" 0-3 4-7 8-11 12-15
done
echo "[cluster] done $(date +%T)" >>"$LOG"
