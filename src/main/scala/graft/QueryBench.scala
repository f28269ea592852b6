package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.PageGen
import graft.index.{IndexBuilder, Search}
import graft.queries.QueryRunner

/** Query-replay latency harness — the analogue of `dcs replay`
  * (reference `cmd/dcs/replay.go:37-45,520-546`): run the frozen
  * reference query set (FIXTURES.md §2) repeatedly against a built
  * index and report per-query p50/p95 latency as JSON.
  *
  * Usage: runMain graft.QueryBench [nDocs] [cores] [iters]
  */
object QueryBench {

  /** the reference query set (FIXTURES.md §2) */
  val QuerySet: Seq[(String, String)] = Seq(
    "rare_term" -> "qmarker3",
    "two_term_and" -> "qmarker3 qmarker7",
    "common_rare_mix" -> "the qmarker5",
    "top_heavy_common" -> "the of and",
    "identifier" -> "needlealpha",
    "phrase" -> "\"data processing\"",
    "or_query" -> "qmarker1 OR qmarker2",
    "no_hit" -> "zzqnohit",
    "lang_filtered" -> "qmarker4 lang:de",
    "host_filtered" -> "qmarker6 site:host13.example")

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val iters = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx = IndexBuilder.build(spark,
      PageGen.pages(spark, nDocs, cores * 2).toDF().select("url", "text", "lang"),
      IndexBuilder.Config(
        docsPerShard = math.max(1L, nDocs / (cores * 2L)),
        blockSize = 256, buildTrigrams = false, partitions = cores * 2)).cache()
    idx.postings.count(); idx.docmap.count(); idx.docnorms.count(); idx.termstats.count()

    def pct(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, math.ceil(p / 100.0 * s.length).toInt - 1).max(0))
    }

    // cost split mirrors dcs replay (`cmd/dcs/replay.go:37-45`):
    // posting_ms = candidate generation (posting evaluation) alone;
    // total_ms = the full query (candidates + BM25 + top-k + docmap);
    // files_searched = candidate count, matches = result rows
    val results = QuerySet.map { case (name, q) =>
      // warm once (plan compile), then measure
      QueryRunner.run(spark, idx, q, 10).collect()
      QueryRunner.candidates(spark, idx, q).count()
      val totals = Array.fill(iters) {
        val t0 = System.nanoTime()
        val n = QueryRunner.run(spark, idx, q, 10).collect().length
        ((System.nanoTime() - t0) / 1e6, n)
      }
      val postings = Array.fill(iters) {
        val t0 = System.nanoTime()
        val n = QueryRunner.candidates(spark, idx, q).count()
        ((System.nanoTime() - t0) / 1e6, n)
      }
      (name, pct(totals.map(_._1), 50), pct(totals.map(_._1), 95),
        pct(postings.map(_._1), 50), postings.head._2, totals.head._2)
    }
    val qjson = results.map { case (n, p50, p95, post50, searched, rows) =>
      f""""$n":{"p50_ms":$p50%.1f,"p95_ms":$p95%.1f,""" +
        f""""posting_p50_ms":$post50%.1f,"files_searched":$searched,"matches":$rows}"""
    }.mkString("{", ",", "}")
    println(s"""{"n_docs":$nDocs,"cores":$cores,"iters":$iters,"queries":$qjson}""")
    spark.stop()
  }
}
