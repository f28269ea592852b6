#!/bin/bash
# Pinned 2->8 scaling pair under the fixed JVM config (config B:
# 64g pre-touched heap + throughput collector — see pinned_scaling.sh for
# why). The 2->8 pair sits within this host's DRAM bandwidth (platform
# memcopy control only collapses above ~8 streams), so it is the pair
# where the north-rule >=0.8 gate is meaningfully measurable on one box.
# Interleaved rounds, per-level minima, one warmed build per pinned JVM
# (BENCH/BASELINE.md section 0 methodology).
#
# WAIT_PID: optionally wait for a prior measurement process to exit first.
set -u
cd /root/repo
ROUNDS=${ROUNDS:-8}
LOG=${LOG:-/tmp/pinned_2_8_B.log}
C16=/dev/shm/graft-corpus-1600k
export SPARK_DRIVER_MEM=64g
export SPARK_GRAFT_JVMOPTS="-Xms64g -XX:+AlwaysPreTouch -XX:+UseParallelGC"

if [ -n "${WAIT_PID:-}" ]; then
  echo "[pinned28] waiting for pid $WAIT_PID $(date +%T)" >>"$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "[pinned28] start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"

run() { # cores range tag
  local cores=$1 range=$2 tag=$3
  SPARK_GRAFT_NHIGH=8 taskset -c "$range" \
    sbt -batch "runMain graft.tools.BuildOnce $cores $C16 $tag" 2>&1 \
    | grep -E "total_sec|stage=" >>"$LOG"
}

for r in $(seq 1 "$ROUNDS"); do
  echo "[pinned28] round $r start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  run 2 0-1 "r$r"
  run 8 0-7 "r$r"
done
echo "[pinned28] done $(date +%T)" >>"$LOG"
