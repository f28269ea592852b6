package graft

import org.apache.spark.sql.SparkSession

/** Round benchmark: index-build throughput + per-query latency over the
  * sfDir tables. One JSON line on stdout (driver contract).
  *
  * The index is built once (timed, reported as docs/sec and as the
  * `index_build` entry) and cached; query timings then measure the query
  * path itself — mirroring dcs's replay harness split of posting time vs
  * total time (`cmd/dcs/replay.go:37-45`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // timed index build (includes trigram sections), then force-cache
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val tBuild = time {
      val idx = SparkEntry.index(spark, sfDir)
      idx.postings.count(); idx.trigrams.foreach(_.count())
      idx.docmap.count(); idx.docnorms.count(); idx.termstats.count()
    }
    val docsPerSec = nDocs / math.max(tBuild, 1e-9)

    // a query that throws records its elapsed time AND an explicit error
    // entry — never a sentinel that could read as "fast" in a regression
    val results = scala.collection.mutable.LinkedHashMap[String, Double](
      "index_build" -> tBuild)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_ONLY=q_a,q_b restricts to a subset (targeted scale runs)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // the persisted (on-disk) build is SHARED by q_fuzzy_query, q_suggest,
    // q_suffix_rev and q_lineage — timed here under its own label (build
    // AND load-side cache fill force-counted, like index_build above) so
    // those rows measure pure query latency, not whichever consumer ran
    // first alphabetically (the r04→r05 q_fuzzy_query/q_lineage row swap).
    // Error-guarded like every row, and skipped when a targeted ONLY run
    // includes none of its consumers.
    val persistedConsumers =
      Set("q_fuzzy_query", "q_suggest", "q_suffix_rev", "q_lineage")
    if (only.forall(o => (o intersect persistedConsumers).nonEmpty))
      results("index_build_persisted") = time {
        try {
          val p = SparkEntry.persisted(spark, sfDir)
          p.postings.count(); p.trigrams.foreach(_.count())
          p.docmap.count(); p.docnorms.count(); p.termstats.count()
          p.revdict.foreach(_.count()); p.deldict.foreach(_.count())
        } catch { case e: Throwable =>
          errors("index_build_persisted") = e.getClass.getSimpleName
          System.err.println(s"[bench] index_build_persisted FAILED: ${e.getMessage}")
        }
      }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      results(name) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          errors(name) = e.getClass.getSimpleName
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
    }

    // escape interpolated strings (sfDir is user-controlled; a quote or
    // backslash in the path must not break the one-line driver contract)
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case '\n' => "\\n"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => q(k) + f":$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.values.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""errors":$errJson,"n_errors":${errors.size},""" +
        f""""sf":${q(sfDir)},"n_docs":$nDocs,"build_sec":$tBuild%.3f,""" +
        f""""build_docs_per_sec":$docsPerSec%.1f}""")
    spark.stop()
  }
}
