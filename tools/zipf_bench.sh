#!/bin/bash
# §6c: dedup-pipeline bench on a REALISTIC (Zipf 1e5-term) vocabulary at
# sf0.1-shape and sf1-shape (10x rows), so LSH growth is measured without
# the 30-word toy vocabulary's shingle-space saturation (§6b caveat).
set -eu
cd /root/repo
LOG=${LOG:-/root/repo/BENCH/logs/zipf_bench.log}
mkdir -p "$(dirname "$LOG")"
Q=q_dedup_exact,q_minhash_bands,q_lsh_jaccard,q_simhash,q_ngram_jaccard,q_newest_version
echo "[zipf] start $(date +%T)" >>"$LOG"
sbt -batch "runMain graft.tools.GenSf /dev/shm/graft-sf/sf01z 1 zipf" >>"$LOG" 2>&1
sbt -batch "runMain graft.tools.GenSf /dev/shm/graft-sf/sf1z 10 zipf" >>"$LOG" 2>&1
for d in sf01z sf1z; do
  SPARK_GRAFT_SF_DIR=/dev/shm/graft-sf/$d SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$Q \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' >>"$LOG"
done
echo "[zipf] done $(date +%T)" >>"$LOG"
tail -3 "$LOG"
