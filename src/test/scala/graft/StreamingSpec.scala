package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PageGen
import graft.index.{IndexBuilder, IndexPublisher, Search}
import graft.streaming.IndexFeeder

/** Streaming feeder: micro-batches become per-batch indexes (the dcs
  * per-package index), mergeAndPublish ConcatN's them into a published
  * full version whose query results match a direct batch build over the
  * same documents. */
final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def syntheticEvents: Seq[Ev] = {
    val rnd = new scala.util.Random(31)
    val types = Array("view", "click", "error")
    (0 until 300).map { i =>
      // ragged inter-arrival times so sessions and windows both split
      val ts = new java.sql.Timestamp(1704067200000L + i * 137000L + rnd.nextInt(60000))
      Ev(i.toLong, ts, rnd.nextInt(7).toLong, types(rnd.nextInt(3)),
        math.round(rnd.nextDouble() * 1000) / 100.0)
    }
  }

  test("streaming windowed counts (watermark) == batch windowedCounts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val events = syntheticEvents
    val mem = MemoryStream[Ev]
    val out = graft.streaming.Events.streamingWindowedCounts(
      mem.toDF(), width = "1 hour", watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("winagg")
      .outputMode("update").start()
    // two in-order micro-batches (watermark never drops anything in-order)
    mem.addData(events.take(150): _*)
    q.processAllAvailable()
    mem.addData(events.drop(150): _*)
    q.processAllAvailable()
    q.stop()
    // Update mode re-emits refined windows; the LAST emission per key is
    // the final value — compare that against the batch twin
    val streamed = spark.table("winagg")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) } // later rows overwrite
    val batch = graft.streaming.Events.windowedCounts(spark.createDataset(events).toDF(), "1 hour")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed.keySet == batch.keySet)
    // counts must match exactly; sums are refined per update — final wins
    streamed.foreach { case (k, (n, s)) =>
      assert((n, s) == batch(k), s"window $k: streamed ${(n, s)} batch ${batch(k)}")
    }
  }

  test("windowed counts run in APPEND mode: watermark drives emission + late drop") {
    // append mode REQUIRES the aggregation to see the watermark — if the
    // plan re-projects cast(ts) after withWatermark, the attribute loses
    // its watermark metadata and this query refuses to start
    // (code-review r05); it also proves state finalizes and a row behind
    // the watermark is dropped, not aggregated
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val t0 = 1704067200000L // window [t0, t0+1h)
    def ev(id: Long, offMs: Long, v: Double) =
      Ev(id, new java.sql.Timestamp(t0 + offMs), 1L, "view", v)
    val mem = MemoryStream[Ev]
    val out = graft.streaming.Events.streamingWindowedCounts(
      mem.toDF(), width = "1 hour", watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("winappend")
      .outputMode("append").start()
    mem.addData(ev(0, 0L, 1.0), ev(1, 60000L, 2.0))
    q.processAllAvailable()
    // advance event time far past window end + watermark → finalize w0
    mem.addData(ev(2, 3 * 3600000L, 4.0))
    q.processAllAvailable()
    // a straggler behind the watermark: must be DROPPED, not re-opened
    mem.addData(ev(3, 120000L, 8.0))
    q.processAllAvailable()
    // one more advance so any (wrongly) re-opened window would emit
    mem.addData(ev(4, 6 * 3600000L, 16.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("winappend").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq.sortBy(_._1)
    val w0 = 1704067200000000L
    // w0 emitted exactly once, with only the two pre-watermark rows
    assert(rows.count(_._1 == w0) == 1)
    assert(rows.find(_._1 == w0).get == ((w0, 2L, 3.0)))
  }

  test("mapGroupsWithState running totals == batch groupBy totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val events = syntheticEvents
    val mem = MemoryStream[Ev]
    val out = graft.streaming.Events.runningUserTotals(mem.toDF())
    val q = out.toDF().writeStream.format("memory").queryName("usertotals")
      .outputMode("update").start()
    mem.addData(events.take(100): _*)
    q.processAllAvailable()
    mem.addData(events.drop(100): _*)
    q.processAllAvailable()
    q.stop()
    // state accumulates across micro-batches; last emission per user is
    // the full running total
    val streamed = spark.table("usertotals").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }
    val batch = spark.createDataset(events).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("value").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (u, (n, s)) =>
      val (bn, bs) = batch(u)
      assert(n == bn && math.abs(s - bs) < 1e-9, s"user $u")
    }
  }

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

    assert(IndexFeeder.batchDirs(root).size >= 1)
    // a partially-built batch (meta.json only, no final stage markers)
    // must NOT count as committed
    val partial = new java.io.File(s"$root/batches/b999")
    partial.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/batches/b999/meta.json"), "{}")
    assert(!IndexFeeder.batchDirs(root)
      .exists(_.endsWith("b999")))
    org.apache.commons.io.FileUtils.deleteDirectory(partial)
    // the feeder's batches are shard-aligned -> concat fast path applies
    val loadedParts = IndexFeeder.batchDirs(root)
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

    // the published version keeps the reversed-term dictionary, so
    // suffix wildcards stay on the rev-prefix fast path after a
    // merge+publish cycle (r04: persist dropped it silently)
    assert(published.revdict.isDefined)
    val viaRev = Search.expandSuffix(spark, published, "marker5")
    assert(viaRev == Seq("qmarker5"))

    // r06: publish writes the COMBINED blocks layout (one dir, kind
    // column) — the same layout fresh persistent builds use; the legacy
    // separate postings/trigrams dirs are gone from published versions
    val verDir = s"$root/${IndexPublisher.currentVersion(root).get}"
    assert(new java.io.File(s"$verDir/blocks").exists())
    assert(!new java.io.File(s"$verDir/postings").exists())
    assert(!new java.io.File(s"$verDir/trigrams").exists())
  }

  test("published index enforces the docs-text contract (r05)") {
    import org.apache.spark.sql.functions.col
    // pre-r05 persists wrote a fake text="" column: a caller who fed the
    // published docs into substring/grepContext verified against silently
    // EMPTY text. Now the column is absent (loud failure) and
    // meta.textInDocs records the contract.
    val dir = java.nio.file.Files.createTempDirectory("graft-pubtext").toString
    val docsDf = PageGen.pages(spark, 150, 2).toDF().select("url", "text", "lang")
    val cfg = IndexBuilder.Config(docsPerShard = 64, blockSize = 16, partitions = 2)
    val mem = IndexBuilder.build(spark, docsDf, cfg)
    IndexFeeder.persist(mem, s"$dir/v1")
    val pub = IndexBuilder.load(spark, s"$dir/v1")
    assert(!pub.meta.textInDocs)
    // reading raw text from the published docs table fails LOUDLY
    val pubDocs = spark.read.parquet(s"$dir/v1/docs")
    assert(!pubDocs.columns.contains("text"))
    intercept[org.apache.spark.sql.AnalysisException] {
      pubDocs.select("docId", "text").collect()
    }
    // substring over the published index with an EXTERNAL docs table
    // works and matches a brute-force contains scan
    val ext = mem.docmap.toDF().select(col("docId"), col("url"))
      .join(docsDf, "url").select("docId", "text")
    val got = Search.substring(spark, pub, ext, "qmarker5")
      .collect().map(_.getLong(0)).sorted
    val want = ext.filter(col("text").contains("qmarker5"))
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want) && want.nonEmpty)
  }
}
