package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.PageGen
import graft.index.IndexBuilder

/** Scaling-efficiency evidence for the north rule: the same index-build
  * job on the same deterministic corpus at two parallelism levels
  * (local[N] vs local[4N] — the sandbox stand-in for N vs 4N executors;
  * no local-mode assumption exists in the job itself, which is plain
  * `spark-submit`-able Dataset code).
  *
  * Usage: runMain graft.Scaling [nDocs] [nLow] [nHigh]
  * Prints one JSON line with throughput at both levels + efficiency.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(120000L)
    val nLow = args.lift(1).map(_.toInt).getOrElse(8)
    val nHigh = args.lift(2).map(_.toInt).getOrElse(32)

    def buildOnce(cores: Int, docs: Long = nDocs): Double = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", (cores * 4).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
      val t0 = System.nanoTime()
      val pages = PageGen.pages(spark, docs, parallelism = cores * 4)
      // persistent build: every artifact materialized exactly once
      // (parquet-out), which is what a production build job does
      IndexBuilder.buildPersistent(spark,
        pages.toDF().select("url", "text", "lang"), dir,
        IndexBuilder.Config(
          docsPerShard = math.max(1L, docs / (cores * 4L)),
          blockSize = 256,
          buildTrigrams = false,
          partitions = cores * 4))
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      sec
    }

    // warm JVM/JIT with a small build so the measured runs compare fairly
    buildOnce(nLow.min(4), docs = nDocs / 10)

    val tLow = buildOnce(nLow)
    val tHigh = buildOnce(nHigh)
    val speedup = tLow / tHigh
    val factor = nHigh.toDouble / nLow
    val efficiency = speedup / factor
    println(
      f"""{"n_docs":$nDocs,"cores_low":$nLow,"cores_high":$nHigh,""" +
        f""""sec_low":$tLow%.2f,"sec_high":$tHigh%.2f,""" +
        f""""docs_per_sec_low":${nDocs / tLow}%.1f,"docs_per_sec_high":${nDocs / tHigh}%.1f,""" +
        f""""speedup":$speedup%.3f,"scale_factor":$factor%.1f,"efficiency":$efficiency%.3f}""")
  }
}
