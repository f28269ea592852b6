#!/bin/bash
# Pinned 1->4 and 2->8 pairs on the 800k corpus under the fixed JVM
# config (config B). Rationale (BENCH/BASELINE.md section 0a): this
# host's DRAM bandwidth saturates at ~50-60k docs/s aggregate, so pairs
# whose HIGH level stays inside that envelope are the only ones that can
# measure the JOB's scaling rather than the box's. 800k docs at
# NHIGH=8 reproduces the round-2 shard size (50k docs/shard) that
# measured 0.765-0.81 at 2->8 under the worse JVM config.
# Interleaved rounds, per-level minima (section 0 methodology).
set -u
cd /root/repo
ROUNDS=${ROUNDS:-8}
LOG=${LOG:-/tmp/pinned_small.log}
C8=/dev/shm/graft-corpus-800k
export SPARK_DRIVER_MEM=64g
export SPARK_GRAFT_JVMOPTS="-Xms64g -XX:+AlwaysPreTouch -XX:+UseParallelGC"

if [ -n "${WAIT_PID:-}" ]; then
  echo "[small] waiting for pid $WAIT_PID $(date +%T)" >>"$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
[ -d "$C8" ] || sbt -batch "runMain graft.tools.BuildOnce gen 800000 $C8" >>"$LOG" 2>&1
echo "[small] start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"

run() { # cores range tag
  local cores=$1 range=$2 tag=$3
  SPARK_GRAFT_NHIGH=8 taskset -c "$range" \
    sbt -batch "runMain graft.tools.BuildOnce $cores $C8 $tag" 2>&1 \
    | grep -E "total_sec|stage=" >>"$LOG"
}

for r in $(seq 1 "$ROUNDS"); do
  echo "[small] round $r start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  run 1 0   "r$r"
  run 4 0-3 "r$r"
  run 2 0-1 "r$r"
  run 8 0-7 "r$r"
done
echo "[small] done $(date +%T)" >>"$LOG"
