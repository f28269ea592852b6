#!/bin/bash
# Pinned N->4N scaling measurement at the 4->16 and 8->32 pairs
# (BENCH/BASELINE.md section 0 methodology, extended per VERDICT r02 #3):
# one warmed build per CPU-pinned JVM, interleaved rounds, per-level
# minima. Corpora are deterministic PageGen parquet on tmpfs.
set -u
cd /root/repo
ROUNDS=${ROUNDS:-8}
LOG=${LOG:-/tmp/pinned_scaling.log}
C16=/dev/shm/graft-corpus-1600k
C32=/dev/shm/graft-corpus-3200k
export SPARK_DRIVER_MEM=64g
# 8g OOMs and 24g GC-thrashes under ParallelGC at 16c x 1.6M (measured,
# tools/pinned_matrix.sh) — a single-JVM artifact: a real 4x-executor step
# brings 4x heaps. AlwaysPreTouch moves the 64 GiB first-touch page
# zeroing out of the measured run; the throughput collector removes G1's
# confinement penalty (config A vs B: 16c 31.4s -> 18.9s on the same
# corpus, same cores).
export SPARK_GRAFT_JVMOPTS="-Xms64g -XX:+AlwaysPreTouch -XX:+UseParallelGC"

[ -d "$C16" ] || sbt -batch "runMain graft.tools.BuildOnce gen 1600000 $C16" >>"$LOG" 2>&1
[ -d "$C32" ] || sbt -batch "runMain graft.tools.BuildOnce gen 3200000 $C32" >>"$LOG" 2>&1
echo "[pinned] corpora ready $(date +%T)" >>"$LOG"

run() { # cores first..last corpus nhigh tag
  local cores=$1 range=$2 corpus=$3 nhigh=$4 tag=$5
  SPARK_GRAFT_NHIGH=$nhigh taskset -c "$range" \
    sbt -batch "runMain graft.tools.BuildOnce $cores $corpus $tag" 2>&1 \
    | grep -E "total_sec|stage=" >>"$LOG"
}

for r in $(seq 1 "$ROUNDS"); do
  echo "[pinned] round $r start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  run 4  0-3   "$C16" 16 "r$r"
  run 16 0-15  "$C16" 16 "r$r"
  run 8  0-7   "$C32" 32 "r$r"
  run 32 0-31  "$C32" 32 "r$r"
done
echo "[pinned] done $(date +%T)" >>"$LOG"
