#!/bin/bash
# JVM-config diagnostic for the pinned scaling measurement: same pinned
# BuildOnce, alternative JVM configs, interleaved 4c/16c runs on the
# 1.6M corpus — isolates how much of the 4->16 gap is heap/GC
# methodology (first-touch page zeroing of a cold -Xms heap, G1 vs
# throughput collector) vs host capacity. Config A (64g G1 lazy heap)
# needs no runs here: the main pinned_scaling.sh grid measures it.
set -u
cd /root/repo
ROUNDS=${ROUNDS:-2}
LOG=${LOG:-/tmp/pinned_matrix.log}
C16=/dev/shm/graft-corpus-1600k

run() { # cores range nhigh mem opts tag
  local cores=$1 range=$2 nhigh=$3 mem=$4 opts=$5 tag=$6
  SPARK_GRAFT_NHIGH=$nhigh SPARK_DRIVER_MEM=$mem SPARK_GRAFT_JVMOPTS="-Xms$mem $opts" \
    taskset -c "$range" \
    sbt -batch "runMain graft.tools.BuildOnce $cores $C16 $tag" 2>&1 \
    | grep -E "total_sec" >>"$LOG"
}

PT="-XX:+AlwaysPreTouch -XX:+UseParallelGC"
for r in $(seq 1 "$ROUNDS"); do
  echo "[matrix] round $r start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  run 4  0-3  16 64g "$PT" "B64gPT-r$r"   # B: 64g pre-touched + parallel GC
  run 16 0-15 16 64g "$PT" "B64gPT-r$r"
  run 4  0-3  16 24g "$PT" "C24gPT-r$r"   # C: right-sized 24g variant
  run 16 0-15 16 24g "$PT" "C24gPT-r$r"
done
echo "[matrix] done $(date +%T)" >>"$LOG"
