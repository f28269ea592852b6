package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PageGen
import graft.index.{IndexBuilder, IndexPublisher, Search}
import graft.streaming.IndexFeeder

/** Streaming feeder: micro-batches become per-batch indexes (the dcs
  * per-package index), mergeAndPublish ConcatN's them into a published
  * full version whose query results match a direct batch build over the
  * same documents. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("file-stream batches -> per-batch indexes -> merged publish == direct build") {
    val root = java.nio.file.Files.createTempDirectory("graft-feed").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-feed-in").toString
    // docsPerShard divides the first batch size (120), so mergeAndPublish
    // exercises the block-level ConcatN fast path end-to-end
    val cfg = IndexBuilder.Config(docsPerShard = 60, blockSize = 16,
      partitions = 2, buildTrigrams = false)

    // two "arrivals" of url-contiguous document ranges (dcs packages)
    val all = PageGen.pages(spark, 240, 2).toDF()
      .select("url", "text", "lang").orderBy("url").collect()
    val parts = Seq(all.slice(0, 120), all.slice(120, 240))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val query = IndexFeeder.start(spark, stream, root, cfg)
    parts.zipWithIndex.foreach { case (rows, i) =>
      // land one flat parquet FILE per arrival (the file source does not
      // recurse into subdirectories)
      val stage = s"$inDir-stage$i"
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .coalesce(1).write.parquet(stage)
      val f = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$inDir/docs$i.parquet"))
      query.processAllAvailable()
    }
    query.stop()

    assert(IndexFeeder.batchDirs(root, withTrigrams = cfg.buildTrigrams).size >= 1)
    // a partially-built batch (meta.json only, no final stage markers)
    // must NOT count as committed
    val partial = new java.io.File(s"$root/batches/b999")
    partial.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/batches/b999/meta.json"), "{}")
    assert(!IndexFeeder.batchDirs(root, withTrigrams = cfg.buildTrigrams)
      .exists(_.endsWith("b999")))
    org.apache.commons.io.FileUtils.deleteDirectory(partial)
    // the feeder's batches are shard-aligned -> concat fast path applies
    val loadedParts = IndexFeeder.batchDirs(root, withTrigrams = cfg.buildTrigrams)
      .map(d => IndexBuilder.load(spark, d))
    assert(graft.index.IndexMerger.canConcat(loadedParts, cfg))
    val merged = IndexFeeder.mergeAndPublish(spark, root, cfg)
    assert(merged.isDefined)
    assert(IndexPublisher.currentVersion(root).isDefined)

    val published = IndexPublisher.loadCurrent(spark, root)
    assert(published.meta.nDocs == 240)
    val direct = IndexBuilder.build(spark,
      spark.createDataFrame(spark.sparkContext.parallelize(all.toSeq, 2), schema), cfg)
    val q = Seq("the", "qmarker5")
    val a = Search.topK(spark, published, q, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Search.topK(spark, direct, q, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }
}
