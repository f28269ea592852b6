# Shared executor-discovery helper for the cluster harness scripts
# (cluster_scaling.sh / cluster_scaling_fine.sh / cluster_weak.sh /
# cluster_query.sh). ONE definition so a scoping fix (like r04's
# -Dgraft.harness tagging) cannot silently miss one script
# (code-review r05).
#
# only THIS harness's executor backends: the launcher tags executor JVMs
# with -Dgraft.harness (via SPARK_GRAFT_EXEC_EXTRAOPTS ->
# spark.executor.extraJavaOptions), so a concurrent unrelated Spark job's
# executors are never killed, waited on, or pinned (ADVICE r04)
graft_executors() {
  local p
  for p in $(pgrep -f "executor.CoarseGrainedExecutorBackend" 2>/dev/null); do
    if tr '\0' ' ' < "/proc/$p/cmdline" 2>/dev/null | grep -q "graft.harness"; then
      echo "$p"
    fi
  done
}
