#!/bin/bash
# Same-mode platform control for tools/cluster_scaling.sh: what does
# TRIVIALLY PARALLEL multi-JVM work scale like on this host at exactly
# the local-cluster core sets? Low level = 1 JVM x C threads over N docs;
# high level = 4 concurrent JVMs x C threads over N/4 docs each (strong
# scaling, like the job). Each JVM is taskset-pinned at LAUNCH to its own
# core set and sized with -XX:ActiveProcessorCount — the identical
# discipline ClusterBuild executors get. No shuffle, no scheduler, no
# parquet: anything the JOB loses beyond this control is platform, not
# plan. Phases: jvmcpu (alloc-heavy generate+tokenize — the job's upper
# bound on this host) and memcopy (DRAM stream — the floor).
#
# Timing: per-JVM we take Probe's own "sec=" (phase only, JVM boot
# excluded); a level's time is the MAX over its concurrent JVMs.
set -u
cd /root/repo
ROUNDS=${ROUNDS:-3}
LOG=${LOG:-/root/repo/BENCH/logs/cluster_control.log}
FROZEN=${FROZEN:-/dev/shm/graft-frozen-classes}
[ -d "$FROZEN" ] || { mkdir -p "$(dirname "$FROZEN")"; cp -r target/scala-2.13/classes "$FROZEN"; }
mkdir -p "$(dirname "$LOG")" /dev/shm/graft-spark
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)

# one_jvm <cores> <nDocs> <phase> <coreset> <outfile>
one_jvm() {
  local c=$1 n=$2 phase=$3 set=$4 out=$5
  taskset -c "$set" java $ADDOPENS -Xmx4g -Xms4g -XX:+AlwaysPreTouch -XX:+UseParallelGC \
    -XX:ActiveProcessorCount="$c" -XX:ParallelGCThreads="$c" \
    -Dspark.ui.enabled=false \
    -cp "$FROZEN:/opt/spark/jars/*" graft.tools.Probe "$c" "$n" "$phase" >"$out" 2>&1
}

# level <W> <C> <nTotal> <phase> <tag> <coreSets...> — W concurrent JVMs,
# each over nTotal/W docs; logs the max per-JVM phase seconds
level() {
  local w=$1 c=$2 n=$3 phase=$4 tag=$5; shift 5
  local per=$(( n / w ))
  local pids=() outs=()
  local i=0
  for set in "$@"; do
    local of=/tmp/ctl_${tag}_${phase}_$i.out
    one_jvm "$c" "$per" "$phase" "$set" "$of" &
    pids+=($!); outs+=("$of")
    i=$((i+1))
  done
  wait "${pids[@]}"
  local maxsec
  maxsec=$(grep -h "sec=" "${outs[@]}" | sed 's/.*sec=//' | sort -g | tail -1)
  echo "[control] tag=$tag phase=$phase workers=$w cores=$c n=$n max_sec=$maxsec" >>"$LOG"
}

echo "[control] start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
for r in $(seq 1 "$ROUNDS"); do
  echo "[control] round $r $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >>"$LOG"
  # E1 axis: 1x2 vs 4x2 (2 -> 8 cores); E2 axis: 1x4 vs 4x4 (4 -> 16)
  for phase in jvmcpu memcopy; do
    case $phase in
      jvmcpu)  n1=1600000; n2=3200000;;
      memcopy) n1=8000000; n2=16000000;;
    esac
    level 1 2 "$n1" "$phase" "C1low_r$r"  0-1
    level 4 2 "$n1" "$phase" "C1high_r$r" 0-1 2-3 4-5 6-7
    level 1 4 "$n2" "$phase" "C2low_r$r"  0-3
    level 4 4 "$n2" "$phase" "C2high_r$r" 0-3 4-7 8-11 12-15
  done
done
echo "[control] done $(date +%T)" >>"$LOG"
