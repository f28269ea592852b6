#!/bin/bash
# WEAK-scaling pairs on local-cluster[W,C,M]: 1 worker over corpus/4 vs
# 4 workers over the full corpus — the axis a production cluster
# actually grows along (data scales with executors; north rule's 100 TB
# framing). Work discipline: docsPerShard IDENTICAL at both levels
# (nHigh chosen so nDocs/(nHigh*spc) matches the strong-scaling high
# level's shard size), so each executor core sees the same number of
# same-sized shards at both levels. The high levels are the SAME
# configs as tools/cluster_scaling_fine.sh F1high/F2high — their
# samples are shared between the strong and weak tables.
set -u
cd /root/repo
ROUNDS=${ROUNDS:-3}
LOG=${LOG:-/root/repo/BENCH/logs/cluster_scaling_fine.log}
C8=/dev/shm/graft-corpus-800k
C16=/dev/shm/graft-corpus-1600k
C32=/dev/shm/graft-corpus-3200k
C64=/dev/shm/graft-corpus-6400k
WARM=/dev/shm/graft-corpus-800k
export SPARK_GRAFT_WARMUP_CORPUS=$WARM
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR=/dev/shm/graft-spark/work
export SPARK_GRAFT_SHARDS_PER_CORE=${SPARK_GRAFT_SHARDS_PER_CORE:-8}
mkdir -p /dev/shm/graft-spark/work "$(dirname "$LOG")"
FROZEN=${FROZEN:-/dev/shm/graft-frozen-classes}
[ -d "$FROZEN" ] || cp -r target/scala-2.13/classes "$FROZEN"
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)

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
    > /tmp/cbf_$tag.out 2>&1 &
  local sbtpid=$!
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
  local dpid
  dpid=$(pgrep -f "graft.tools.ClusterBuild" | head -1)
  [ -n "$dpid" ] && taskset -a -p -c 28-31 "$dpid" >/dev/null 2>&1
  touch "$pf"
  wait "$sbtpid"
  grep -hE "clusterbuild. (tag|executors|stage|warmup)" /tmp/cbf_$tag.out >>"$LOG"
}

echo "[cluster] weak start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) spc=$SPARK_GRAFT_SHARDS_PER_CORE" >>"$LOG"
for r in $(seq 1 "$ROUNDS"); do
  echo "[cluster] weak round $r $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  # W1: 1x2 over 800k (dps = 800k/(2*8) = 50k, same as F1high's
  # 3.2M/(8*8)) vs F1high 4x2 over 3.2M — interleaved here so both
  # levels sample the same host windows
  run 1 2 7168 "$C8" 2 "W1low_r$r"  0-1
  run 4 2 7168 "$C32" 8 "F1high_w$r" 0-1 2-3 4-5 6-7
  # W2: 1x4 over 1.6M (dps = 1.6M/(4*8) = 50k, same as F2high's
  # 6.4M/(16*8)) vs F2high 4x4 over 6.4M
  run 1 4 9216 "$C16" 4 "W2low_r$r"  0-3
  run 4 4 9216 "$C64" 16 "F2high_w$r" 0-3 4-7 8-11 12-15
done
echo "[cluster] weak done $(date +%T)" >>"$LOG"
