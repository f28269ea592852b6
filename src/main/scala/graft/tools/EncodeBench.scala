package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.IndexBuilder

/** Head-to-head of the r04 TWO-STAGE full encode (token postings pass +
  * trigram pass, each re-reading and re-shuffling the text) vs the r05
  * COMBINED one-pass encode, on the same corpus parquet at one
  * parallelism level — isolates exactly the text-traffic cut of
  * VERDICT r04 #1 without any harness variance between code versions
  * (both paths still exist in the build; the persistent build uses the
  * combined one).
  *
  *   runMain graft.tools.EncodeBench <cores> <corpusDir> <rounds> [tag]
  *
  * Interleaves rounds (twostage, combined, twostage, ...) and prints
  * per-round seconds plus per-level minima. Pin externally with taskset
  * like BuildOnce for scaling-grade numbers.
  */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val tag = args.lift(3).getOrElse("run")
    val spark = BuildOnce.session(cores, "encodebench")
    import spark.implicits._

    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_NHIGH", "8").toInt
    val cfg = IndexBuilder.Config(
      docsPerShard = math.max(1L, nDocs / (nHigh * 8L)),
      blockSize = 256, buildTrigrams = true, partitions = cores * 2)

    // one id-attached docs parquet (the docmap stage output both paths read)
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-spark"), "eb").toString
    IndexBuilder.assignDocIds(spark, docs.select("url", "text", "lang"), cfg.partitions)
      .toDF("docId", "url", "text", "lang")
      .write.mode("overwrite").parquet(s"$base/docs")
    def docText = spark.read.parquet(s"$base/docs")
      .select("docId", "text").as[(Long, String)]

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def twoStage(out: String): Unit = {
      IndexBuilder.encodeTokenPostings(spark, docText, cfg.docsPerShard, cfg)
        .write.mode("overwrite").parquet(s"$out/postings")
      IndexBuilder.encodeTriPostings(spark, docText, cfg.docsPerShard, cfg)
        .write.mode("overwrite").parquet(s"$out/trigrams")
    }
    def combined(out: String): Unit =
      IndexBuilder.encodeCombined(spark, docText, cfg.docsPerShard, cfg)
        .write.mode("overwrite").partitionBy("kind").parquet(s"$out/blocks")
    // kind as a PLAIN column (no dynamic-partition write): rows leave the
    // encode task already grouped kind=0 then kind=1, so parquet row
    // groups stay kind-pure and a kind filter prunes on min/max stats —
    // without the whole-dataset sort partitionBy plans
    def combinedPlain(out: String): Unit =
      IndexBuilder.encodeCombined(spark, docText, cfg.docsPerShard, cfg)
        .write.mode("overwrite").parquet(s"$out/blocks")

    def rm(d: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    // JIT warmup: one run of each path (outputs dropped immediately -
    // encoded full-positional blocks are corpus-sized; keeping every
    // round's output would fill tmpfs and OOM the box)
    twoStage(s"$base/w2"); rm(s"$base/w2")
    combined(s"$base/wc"); rm(s"$base/wc")
    combinedPlain(s"$base/wp"); rm(s"$base/wp")
    val two = new Array[Double](rounds)
    val comb = new Array[Double](rounds)
    val plain = new Array[Double](rounds)
    for (r <- 0 until rounds) {
      two(r) = timed(twoStage(s"$base/t$r")); rm(s"$base/t$r")
      comb(r) = timed(combined(s"$base/c$r")); rm(s"$base/c$r")
      plain(r) = timed(combinedPlain(s"$base/p$r")); rm(s"$base/p$r")
      println(f"[encodebench] tag=$tag cores=$cores round=$r " +
        f"twostage=${two(r)}%.2f combined=${comb(r)}%.2f plain=${plain(r)}%.2f")
    }
    println(f"[encodebench] tag=$tag cores=$cores nDocs=$nDocs " +
      f"min_twostage=${two.min}%.2f min_combined=${comb.min}%.2f " +
      f"min_plain=${plain.min}%.2f speedup_plain=${two.min / plain.min}%.2f")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
