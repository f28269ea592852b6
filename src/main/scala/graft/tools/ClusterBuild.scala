package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.IndexBuilder

/** One timed index build on a `local-cluster[W,C,M]` pseudo-cluster: W
  * SEPARATE executor JVMs with C cores and their own M-MiB heap each —
  * the multi-executor axis the north rule's "N vs 4N executors" gate
  * names, which a single `local[N]` JVM cannot test (one shared heap/GC
  * subsidizes the low level; BENCH/BASELINE.md §0a). Workers fork real
  * `CoarseGrainedExecutorBackend` processes, so each executor brings its
  * own GC threads, allocation areas and JIT state, exactly like a
  * standalone cluster — only DRAM stays shared (that residual is bounded
  * by the memcopy platform control).
  *
  *   runMain graft.tools.ClusterBuild <workers> <coresPerWorker> <memMB> <corpusDir> [tag]
  *
  * Requires SPARK_HOME=/opt/spark (worker launches executors from it)
  * and SPARK_WORKER_DIR on tmpfs. Pin externally with
  * `taskset -c 0..(W*C-1)` like BuildOnce. Prints one line:
  * [clusterbuild] tag=... workers=W cores=C total_sec=...
  */
object ClusterBuild {
  def main(args: Array[String]): Unit = {
    val workers = args(0).toInt
    val cores = args(1).toInt
    val memMB = args(2).toInt
    val corpusDir = args(3)
    val tag = args.lift(4).getOrElse("run")
    val totalCores = workers * cores
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_NHIGH", "16").toInt
    val spark = PseudoCluster.session(workers, cores, memMB,
      s"graft-clusterbuild-${workers}x$cores", "clusterbuild")
    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    // shards per HIGH-level core (same absolute shard count at both levels
    // of a pair — identical work discipline). Default 8: shards >> tasks,
    // so hash-assigning shards to encode tasks balances (at shards ~=
    // tasks, balls-into-bins leaves ~1/e tasks empty and 2-3x stragglers —
    // and production sizes shards to task memory, far more than 2/core).
    val spc = sys.env.getOrElse("SPARK_GRAFT_SHARDS_PER_CORE", "8").toInt
    // SPARK_GRAFT_TRIGRAMS=1 measures the FULL build (token + trigram
    // sections in the combined one-pass encode); default keeps the
    // token-only shape of the r03/r04 records for comparability
    val withTri = sys.env.get("SPARK_GRAFT_TRIGRAMS").contains("1")
    val cfg = IndexBuilder.Config(
      docsPerShard = math.max(1L, nDocs / (nHigh.toLong * spc)),
      blockSize = 256, buildTrigrams = withTri, partitions = totalCores * 2)
    def buildTo(out: String): Double = {
      val t0 = System.nanoTime()
      IndexBuilder.buildPersistent(spark, docs, out, cfg,
        (st, sec) => println(f"[clusterbuild] stage=$st sec=$sec%.2f"))
      (System.nanoTime() - t0) / 1e9
    }
    def tmp(): String = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-spark"), "cb").toString
    // warmup: JIT + classloading in every executor JVM. A smaller warmup
    // corpus (SPARK_GRAFT_WARMUP_CORPUS) keeps the warmup cost bounded
    // when the measured corpus is large — JIT doesn't need the full set.
    val warmDocs = sys.env.get("SPARK_GRAFT_WARMUP_CORPUS")
      .map(d => spark.read.parquet(d)).getOrElse(docs)
    val w = tmp()
    val tw = System.nanoTime()
    IndexBuilder.buildPersistent(spark, warmDocs, w, cfg, (_, _) => ())
    println(f"[clusterbuild] warmup_sec=${(System.nanoTime() - tw) / 1e9}%.2f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(w))
    val out = tmp()
    val sec = buildTo(out)
    println(f"[clusterbuild] tag=$tag workers=$workers cores=$cores " +
      f"total_sec=$sec%.2f docs_per_sec=${nDocs / sec}%.1f")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
