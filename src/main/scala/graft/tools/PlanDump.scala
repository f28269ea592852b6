package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for selected declared queries plus the raw
  * (un-cached) index-build plans into an output directory — the
  * plans/r06 before/after evidence the optimization round commits.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [sfDir] [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq.empty
    new java.io.File(outDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
      println(s"[plandump] wrote $outDir/$name.txt")
    }

    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) => dump(n, fn(spark, sfDir))
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }

    // q_lsh_jaccard materializes eagerly (localCheckpoint) so the
    // declared query's plan only shows the checkpoint scan; dump the
    // full pre-checkpoint pipeline under its own name
    if (names.isEmpty || names.contains("lsh_pipeline")) {
      dump("lsh_pipeline", graft.operators.Dedup.lshJaccard(
        graft.SparkEntry.corpus(spark, sfDir), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.2,
        materialize = false))
    }

    // the raw build plans, built FRESH and un-cached so the full encode
    // pipeline (not an InMemoryTableScan) is visible
    if (names.isEmpty || names.contains("index_build")) {
      val idx = graft.index.IndexBuilder.build(spark,
        graft.SparkEntry.corpus(spark, sfDir).select("url", "text", "lang"),
        graft.SparkEntry.cfg)
      dump("index_build_postings", idx.postings.toDF())
      dump("index_build_docnorms", idx.docnorms.toDF())
    }
    spark.stop()
  }
}
