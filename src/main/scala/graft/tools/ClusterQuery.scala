package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, Search}

/** Batch-retrieval throughput on a `local-cluster[W,C,M]` pseudo-cluster —
  * the QUERY-side companion to [[ClusterBuild]] for the north rule's
  * N vs 4N executor gate. Same discipline: W separate executor JVMs
  * (own heap/GC/JIT, config-B options), external taskset pinning via the
  * PINFILE rendezvous, per-level minima over interleaved harness rounds.
  *
  * Weak-scaling shape (the axis a 100 TB cluster grows along): the
  * CORPUS scales with the workers, the query set stays fixed — every
  * query touches W× more shards at the high level, so ideal scaling is
  * EQUAL wall clock at both levels (eff = wall_low / wall_high).
  *
  *   runMain graft.tools.ClusterQuery <workers> <coresPerWorker> <memMB> \
  *     <corpusDir> <nQueries> [tag]
  *
  * The index builds untimed inside the session (per-shard cache across
  * the executors), then one warm batch pass, then
  * SPARK_GRAFT_QROUNDS timed passes of Search.topKBatch — prints one
  * line per pass plus a min summary.
  */
object ClusterQuery {
  def main(args: Array[String]): Unit = {
    val workers = args(0).toInt
    val cores = args(1).toInt
    val memMB = args(2).toInt
    val corpusDir = args(3)
    val nQueries = args(4).toInt
    val tag = args.lift(5).getOrElse("run")
    val totalCores = workers * cores
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_NHIGH", "16").toInt
    val qrounds = sys.env.getOrElse("SPARK_GRAFT_QROUNDS", "5").toInt
    val spark = PseudoCluster.session(workers, cores, memMB,
      s"graft-clusterquery-${workers}x$cores", "clusterquery")
    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    val spc = sys.env.getOrElse("SPARK_GRAFT_SHARDS_PER_CORE", "8").toInt
    val cfg = IndexBuilder.Config(
      docsPerShard = math.max(1L, nDocs / (nHigh.toLong * spc)),
      blockSize = 256, buildTrigrams = false, partitions = totalCores * 2)
    // untimed setup: build + cache the index across the executors
    val t0 = System.nanoTime()
    val idx = IndexBuilder.build(spark, docs, cfg).cache()
    idx.postings.count(); idx.docmap.count(); idx.docnorms.count(); idx.termstats.count()
    println(f"[clusterquery] setup_sec=${(System.nanoTime() - t0) / 1e9}%.1f ndocs=$nDocs")

    val q = PseudoCluster.queryMix(spark, nQueries)

    Search.topKBatch(spark, idx, q, 10).count() // warm: JIT + cache touch
    var best = Double.MaxValue
    for (r <- 1 to qrounds) {
      val tq = System.nanoTime()
      val n = Search.topKBatch(spark, idx, q, 10).count()
      val wall = (System.nanoTime() - tq) / 1e9
      best = math.min(best, wall)
      println(f"[clusterquery] tag=$tag round=$r wall=$wall%.2f qps=${nQueries / wall}%.1f rows=$n")
    }
    println(f"[clusterquery] tag=$tag workers=$workers cores=$cores ndocs=$nDocs " +
      f"q=$nQueries min_wall=$best%.2f best_qps=${nQueries / best}%.1f")
    spark.stop()
  }
}
