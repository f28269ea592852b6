package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.PageGen
import graft.index.IndexBuilder

/** One timed index build at one parallelism level, for externally
  * CPU-PINNED scaling measurements: `local[N]` alone does not confine the
  * JVM's GC/JIT/shuffle-IO threads, which run on idle vCPUs and subsidize
  * the low level (under-reporting N→4N efficiency). Run under
  * `taskset -c 0..N-1` so the WHOLE JVM sees exactly N CPUs:
  *
  *   runMain graft.tools.BuildOnce <cores> <corpusDir> [tag]
  *
  * The corpus must be pre-materialized (runMain graft.tools.BuildOnce gen
  * <nDocs> <corpusDir>). Prints one line: [buildonce] tag=... sec=...
  */
object BuildOnce {
  def main(args: Array[String]): Unit = {
    if (args(0) == "gen") {
      val n = args(1).toLong
      val dir = args(2)
      val s = session(32)
      PageGen.pages(s, n, parallelism = 64)
        .toDF().select("url", "text", "lang")
        .write.mode("overwrite").parquet(dir)
      s.stop()
      return
    }
    val cores = args(0).toInt
    val corpusDir = args(1)
    val tag = args.lift(2).getOrElse("run")
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_NHIGH", "8").toInt
    val spark = session(cores)
    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    // shards per HIGH-level core, like ClusterBuild: the old hardcoded 2
    // put the high level at shards ~= tasks — the balls-into-bins
    // straggler regime that distorts the very scaling this tool measures
    // (code-review r05; pre-r05 records used the equivalent of spc=2)
    val spc = sys.env.getOrElse("SPARK_GRAFT_SHARDS_PER_CORE", "8").toInt
    val cfg = IndexBuilder.Config(
      docsPerShard = math.max(1L, nDocs / (nHigh.toLong * spc)),
      blockSize = 256,
      buildTrigrams = sys.env.get("SPARK_GRAFT_TRIGRAMS").contains("1"),
      partitions = cores * 2)
    // warmup build in the SAME pinned JVM (JIT+classloading), then timed
    def buildTo(out: String, stage: (String, Double) => Unit): Double = {
      val t0 = System.nanoTime()
      IndexBuilder.buildPersistent(spark, docs, out, cfg, stage)
      (System.nanoTime() - t0) / 1e9
    }
    def tmp(): String = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-spark"), "b1").toString
    val w = tmp()
    buildTo(w, (_, _) => ())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(w))
    val out = tmp()
    val sec = buildTo(out,
      (st, s) => println(f"[buildonce] tag=$tag cores=$cores stage=$st sec=$s%.2f"))
    println(f"[buildonce] tag=$tag cores=$cores total_sec=$sec%.2f docs_per_sec=${nDocs / sec}%.1f")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  // shared with EncodeBench: ONE single-JVM measurement session
  // definition, mirroring PseudoCluster's rationale — the build-side
  // tools' environments cannot silently diverge (code-review r05)
  private[tools] def session(cores: Int, app: String = "buildonce"): SparkSession = {
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-$app-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
