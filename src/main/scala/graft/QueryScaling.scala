package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.corpus.PageGen
import graft.index.{IndexBuilder, Search}
import graft.queries.QueryRunner

/** Query-THROUGHPUT scaling evidence for the north rule's query side.
  *
  * Two workload shapes, measured at two parallelism levels over the SAME
  * corpus and deterministic query mix:
  *
  *  - mode `batch` (default; the 100 TB Spark shape): Q queries scored in
  *    ONE Spark job via Search.topKBatch — per-shard term decode shared
  *    across queries, cores scale the (shard × query) work.
  *  - mode `concurrent` (the job-per-query serving artifact): T=cores
  *    client threads each replaying the frozen query set through
  *    QueryRunner.run. This shape is bounded by the DRIVER's job
  *    dispatch (~12 qps on this host regardless of cores) — reported
  *    honestly as the reason batch is the scaling path.
  *
  * Usage: runMain graft.QueryScaling [nDocs] [nLow] [nHigh] [qOrSecs] [mode]
  */
object QueryScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val nLow = args.lift(1).map(_.toInt).getOrElse(8)
    val nHigh = args.lift(2).map(_.toInt).getOrElse(32)
    val qOrSecs = args.lift(3).map(_.toInt).getOrElse(2000)
    val mode = args.lift(4).getOrElse("batch")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "3").toInt
    new java.io.File("/dev/shm/graft-spark").mkdirs()

    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-qscale-$cores")
        .config("spark.sql.shuffle.partitions", (cores * 2).toString)
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def withIndex[A](cores: Int)(f: (SparkSession, graft.index.BuiltIndex) => A): A = {
      val spark = session(cores)
      val idx = IndexBuilder.build(spark,
        PageGen.pages(spark, nDocs, cores * 2).toDF().select("url", "text", "lang"),
        IndexBuilder.Config(
          docsPerShard = math.max(1L, nDocs / (nHigh * 2L)),
          blockSize = 256, buildTrigrams = false, partitions = cores * 2)).cache()
      idx.postings.count(); idx.docmap.count(); idx.docnorms.count(); idx.termstats.count()
      val a = f(spark, idx)
      spark.stop()
      a
    }

    def qpsBatch(cores: Int): Double = withIndex(cores) { (spark, idx) =>
      // deterministic rank-skewed mix, shared with ClusterQuery so the
      // single-JVM and multi-executor-JVM records use the SAME query set
      val q = graft.tools.PseudoCluster.queryMix(spark, qOrSecs)
      Search.topKBatch(spark, idx, q, 10).count() // warm
      val t0 = System.nanoTime()
      Search.topKBatch(spark, idx, q, 10).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val qps = qOrSecs / wall
      println(f"[qscaling] mode=batch cores=$cores q=$qOrSecs wall=$wall%.1f qps=$qps%.1f")
      qps
    }

    def qpsConcurrent(cores: Int): Double = withIndex(cores) { (spark, idx) =>
      val queries = QueryBench.QuerySet.map(_._2)
      queries.foreach(q => QueryRunner.run(spark, idx, q, 10).collect())
      val done = new AtomicLong(0)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val threads = (0 until cores).map { t =>
        new Thread(() => {
          var i = t
          while (!stop.get()) {
            QueryRunner.run(spark, idx, queries(i % queries.length), 10).collect()
            done.incrementAndGet()
            i += 1
          }
        })
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start())
      Thread.sleep(qOrSecs * 1000L)
      stop.set(true)
      threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val qps = done.get() / wall
      println(f"[qscaling] mode=concurrent cores=$cores queries=${done.get()} qps=$qps%.1f")
      qps
    }

    val qpsAt: Int => Double = if (mode == "concurrent") qpsConcurrent else qpsBatch

    qpsAt(nLow) // warm JVM/JIT
    var best = (0.0, 0.0)
    for (r <- 1 to rounds) {
      val lo = qpsAt(nLow)
      val hi = qpsAt(nHigh)
      println(f"[qscaling] round=$r qps_low=$lo%.1f qps_high=$hi%.1f")
      best = (math.max(best._1, lo), math.max(best._2, hi))
    }
    val speedup = best._2 / best._1
    val eff = speedup / (nHigh.toDouble / nLow)
    println(
      f"""{"mode":"$mode","n_docs":$nDocs,"cores_low":$nLow,"cores_high":$nHigh,""" +
        f""""qps_low":${best._1}%.1f,"qps_high":${best._2}%.1f,""" +
        f""""speedup":$speedup%.3f,"scale_factor":${nHigh.toDouble / nLow}%.1f,""" +
        f""""efficiency":$eff%.3f}""")
  }
}
