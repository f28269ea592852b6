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
    val execMem = memMB - 1024
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val classes = sys.env.getOrElse("SPARK_GRAFT_CLASSES",
      new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    val extraOpts = sys.env.getOrElse("SPARK_GRAFT_EXEC_EXTRAOPTS", "")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMB]")
      .appName(s"graft-clusterquery-${workers}x$cores")
      .config("spark.executor.memory", s"${execMem}m")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions",
        s"$addOpens -Xms${execMem}m -XX:+AlwaysPreTouch -XX:+UseParallelGC $extraOpts")
      .config("spark.sql.shuffle.partitions", (totalCores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val deadline = System.nanoTime() + 300e9.toLong
    while (spark.sparkContext.getExecutorMemoryStatus.size < workers + 1 &&
        System.nanoTime() < deadline) Thread.sleep(200)
    println(s"[clusterquery] executors=${spark.sparkContext.getExecutorMemoryStatus.size - 1}")
    sys.env.get("SPARK_GRAFT_PINFILE").foreach { pf =>
      println(s"[clusterquery] waiting for pin marker $pf")
      val pinDeadline = System.nanoTime() + 180e9.toLong
      while (!new java.io.File(pf).exists() && System.nanoTime() < pinDeadline)
        Thread.sleep(200)
    }

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

    // deterministic rank-skewed query mix, same shape as graft.QueryScaling
    val rnd = new scala.util.Random(99)
    val rows = (0 until nQueries).map { i =>
      val n = 1 + rnd.nextInt(3)
      (i.toLong, Seq.fill(n)(graft.corpus.PageGen.vocab(rnd.nextInt(2000))))
    }
    val q = spark.createDataFrame(rows).toDF("qid", "terms")

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
