package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.TaskContext

import graft.functions.{Text, Varint}

/** A built (or loaded) index: handles to the five index tables + meta.
  * The on-disk layout is one directory with parquet subdirs — the
  * analogue of a dcs index shard directory (`howto/index.md:71-80`),
  * committed stage-by-stage with marker files for resumability.
  */
final case class BuiltIndex(
    meta: IndexMeta,
    docmap: Dataset[DocEntry],
    docnorms: Dataset[DocNorms],
    postings: Dataset[PostingBlock],
    trigrams: Option[Dataset[TriBlock]],
    termstats: Dataset[TermStats]) {

  def cache(): BuiltIndex = {
    docmap.cache(); docnorms.cache(); postings.cache(); termstats.cache()
    trigrams.foreach(_.cache())
    this
  }
}

/** Streaming posting-block encoder: consumes (term, shard, localDoc, pos)
  * tuples sorted by exactly that order and emits [[PostingBlock]]s of at
  * most `blockSize` docs. Memory is O(blockSize), independent of the
  * term's total df — the spill-safe answer to hot terms (SURVEY §7.3).
  */
private final class BlockEncoder(
    term: String, shard: Int, docsPerShard: Long, blockSize: Int,
    withPositions: Boolean) {
  private val docsBuf = new Array[Int](blockSize)
  private val tfsBuf = new Array[Int](blockSize)
  private var nDocs = 0
  private var blockId = 0
  private var posBuf = new Varint.Buf(64)
  private var relByte = 0; private var relBits = 0
  private var relBuf = new Varint.Buf(16)
  private var nPos = 0
  private var prevPos = 0
  private var curDoc = -1
  private var curTf = 0
  private var maxTf = 0
  private var cf = 0L
  private val out = scala.collection.mutable.ArrayBuffer.empty[PostingBlock]

  private def pushRelBit(b: Int): Unit = {
    relByte |= b << relBits; relBits += 1
    if (relBits == 8) { relBuf.putByte(relByte.toByte); relByte = 0; relBits = 0 }
  }

  private def closeDoc(): Unit = if (curDoc >= 0) {
    docsBuf(nDocs) = curDoc; tfsBuf(nDocs) = curTf; nDocs += 1
    if (curTf > maxTf) maxTf = curTf
    cf += curTf
    curTf = 0
  }

  private def flushBlock(): Unit = if (nDocs > 0) {
    if (relBits > 0) { relBuf.putByte(relByte.toByte); relByte = 0; relBits = 0 }
    val base = shard.toLong * docsPerShard
    out += PostingBlock(
      term, shard, blockId, nDocs, cf, maxTf,
      base + docsBuf(0), base + docsBuf(nDocs - 1),
      Varint.encodeDeltas(java.util.Arrays.copyOf(docsBuf, nDocs)),
      Varint.encodeInts(java.util.Arrays.copyOf(tfsBuf, nDocs)),
      nPos,
      if (withPositions) posBuf.result() else Array.emptyByteArray,
      if (withPositions) relBuf.result() else Array.emptyByteArray)
    blockId += 1; nDocs = 0; maxTf = 0; cf = 0L; nPos = 0
    posBuf = new Varint.Buf(64); relBuf = new Varint.Buf(16)
  }

  def add(localDoc: Int, pos: Int): Unit = {
    if (localDoc != curDoc) {
      closeDoc()
      if (nDocs == blockSize) flushBlock()
      curDoc = localDoc
      prevPos = 0
      if (withPositions) { posBuf.putVarint((pos - prevPos).toLong); prevPos = pos; nPos += 1; pushRelBit(1) }
    } else if (withPositions) {
      posBuf.putVarint((pos - prevPos).toLong); prevPos = pos; nPos += 1; pushRelBit(0)
    }
    curTf += 1
  }

  def finish(): Seq[PostingBlock] = { closeDoc(); flushBlock(); out.toSeq }
}

object IndexBuilder {

  final case class Config(
      docsPerShard: Long = 1L << 14,
      blockSize: Int = 256,
      buildTrigrams: Boolean = true,
      partitions: Int = 32,
      lineageDir: Option[String] = None)

  /** Deterministic dense docId assignment: global rank in `url` order
    * (dcs assigns docids by arrival order within a shard, write.go:151-152;
    * we pin a global deterministic order instead so distributed builds and
    * merges are reproducible — SURVEY §7.0).
    *
    * Implementation: range-repartition by url + per-partition sort gives
    * the global order without a single-partition bottleneck; the dense id
    * is attached via `zipWithIndex` (the one forced RDD hop — a
    * `row_number()` window over a global ORDER BY would funnel all rows
    * through one partition).
    */
  def assignDocIds(spark: SparkSession, docs: DataFrame, partitions: Int): Dataset[(Long, String, String, String)] = {
    import spark.implicits._
    val sorted = docs.select("url", "text", "lang")
      .repartitionByRange(partitions, col("url"))
      .sortWithinPartitions("url")
      .as[(String, String, String)]
    sorted.rdd.zipWithIndex
      .map { case ((url, text, lang), id) => (id, url, text, lang) }
      .toDS()
  }

  /** Build the full index from (url, text, lang) document rows.
    * All shuffles are keyed by (term, shard): one shuffle for the token
    * postings, one for the trigram postings, one tiny one for stats.
    */
  def build(spark: SparkSession, docs: DataFrame, cfg: Config = Config()): BuiltIndex = {
    import spark.implicits._
    val withIds = assignDocIds(spark, docs, cfg.partitions).cache()
    val nDocs = withIds.count()
    val dps = cfg.docsPerShard
    val nShards = math.max(1, ((nDocs + dps - 1) / dps)).toInt

    val docmap: Dataset[DocEntry] = withIds.map { case (id, url, text, lang) =>
      DocEntry(id, url, (id / dps).toInt, Text.tokenize(text).length, lang)
    }.cache()

    val avgdl = docmap.agg(avg(col("dl"))).as[Double].head()

    val docnorms: Dataset[DocNorms] = docmap
      .groupByKey(_.shard)
      .mapGroups { (shard, it) =>
        val entries = it.map(d => (d.docId, d.dl)).toArray.sortBy(_._1)
        DocNorms(shard, shard.toLong * dps, entries.length,
          Varint.encodeInts(entries.map(_._2)))
      }

    val postings = encodeTokenPostings(spark, withIds, dps, cfg)

    val trigrams =
      if (cfg.buildTrigrams) Some(encodeTriPostings(spark, withIds, dps, cfg))
      else None

    val termstats = postings
      .groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxTf").as("maxTf"))
      .as[TermStats]

    val meta = IndexMeta(nDocs, avgdl, dps, nShards, cfg.blockSize, hasPositions = true)
    BuiltIndex(meta, docmap, docnorms, postings, trigrams, termstats)
  }

  /** Tokens → sorted (term, shard, localDoc, pos) → streaming block encode.
    * The (term, shard) shuffle key is the structural salt: a hot term is
    * spread over all doc-shards, so no single reducer sees more than
    * docsPerShard postings of it. */
  def encodeTokenPostings(
      spark: SparkSession,
      withIds: Dataset[(Long, String, String, String)],
      dps: Long,
      cfg: Config): Dataset[PostingBlock] = {
    import spark.implicits._
    val toks = withIds.flatMap { case (id, _, text, _) =>
      val shard = (id / dps).toInt
      val local = (id - shard * dps).toInt
      val t = Text.tokenize(text)
      Iterator.tabulate(t.length)(p => (t(p), shard, local, p))
    }.toDF("term", "shard", "doc", "pos")
    encodeOccurrences(spark, toks, dps, cfg)
  }

  /** Shared shuffle+encode pipeline over raw (term, shard, doc, pos)
    * occurrences — used by both the direct build and the N-way merge. */
  def encodeOccurrences(
      spark: SparkSession,
      toks: DataFrame,
      dps: Long,
      cfg: Config): Dataset[PostingBlock] = {
    import spark.implicits._
    val sorted = toks
      .repartition(cfg.partitions, col("term"), col("shard"))
      .sortWithinPartitions("term", "shard", "doc", "pos")
      .as[(String, Int, Int, Int)]
    sorted.mapPartitions { it =>
      val t0 = System.currentTimeMillis()
      var enc: BlockEncoder = null
      var curTerm: String = null
      var curShard = -1
      var rows = 0L; var terms = 0L
      val blocks = scala.collection.mutable.ArrayBuffer.empty[PostingBlock]
      it.foreach { case (term, shard, doc, pos) =>
        rows += 1
        if (enc == null || term != curTerm || shard != curShard) {
          if (enc != null) blocks ++= enc.finish()
          if (term != curTerm) terms += 1
          enc = new BlockEncoder(term, shard, dps, cfg.blockSize, withPositions = true)
          curTerm = term; curShard = shard
        }
        enc.add(doc, pos)
      }
      if (enc != null) blocks ++= enc.finish()
      writeLineage(cfg.lineageDir, "postings", rows, terms, blocks.length,
        blocks.iterator.map(b => b.docs.length.toLong + b.tfs.length + b.pos.length).sum,
        System.currentTimeMillis() - t0)
      blocks.iterator
    }
  }

  /** Byte-trigram postings with byte-offset positional sections (the dcs
    * docid/pos/posrel sections per trigram, write.go:275-441). */
  def encodeTriPostings(
      spark: SparkSession,
      withIds: Dataset[(Long, String, String, String)],
      dps: Long,
      cfg: Config): Dataset[TriBlock] = {
    import spark.implicits._
    val tris = withIds.flatMap { case (id, _, text, _) =>
      if (!Text.indexable(text)) Iterator.empty
      else {
        val shard = (id / dps).toInt
        val local = (id - shard * dps).toInt
        Text.trigramsWithOffsets(text).iterator.map { case (t, off) => (t, shard, local, off) }
      }
    }.toDF("tri", "shard", "doc", "pos")
    val sorted = tris
      .repartition(cfg.partitions, col("tri"), col("shard"))
      .sortWithinPartitions("tri", "shard", "doc", "pos")
      .as[(Int, Int, Int, Int)]
    sorted.mapPartitions { it =>
      val t0 = System.currentTimeMillis()
      var enc: BlockEncoder = null
      var curTri = -1
      var curShard = -1
      var rows = 0L; var terms = 0L
      val blocks = scala.collection.mutable.ArrayBuffer.empty[TriBlock]
      def finishInto(tri: Int): Unit = if (enc != null) {
        // the all-spaces trigram keeps its docid section but drops the
        // positional sections (dcs write.go:346, merge.go:366,432)
        val noPos = tri == Text.AllSpaces
        blocks ++= enc.finish().map(b => TriBlock(tri, b.shard, b.blockId, b.df,
          b.firstDoc, b.lastDoc, b.docs,
          if (noPos) 0 else b.nPos,
          if (noPos) Array.emptyByteArray else b.pos,
          if (noPos) Array.emptyByteArray else b.posrel))
      }
      it.foreach { case (tri, shard, doc, pos) =>
        rows += 1
        if (enc == null || tri != curTri || shard != curShard) {
          finishInto(curTri)
          if (tri != curTri) terms += 1
          enc = new BlockEncoder("", shard, dps, cfg.blockSize, withPositions = true)
          curTri = tri; curShard = shard
        }
        enc.add(doc, pos)
      }
      finishInto(curTri)
      writeLineage(cfg.lineageDir, "trigrams", rows, terms, blocks.length,
        blocks.iterator.map(b => b.docs.length.toLong + b.pos.length).sum,
        System.currentTimeMillis() - t0)
      blocks.iterator
    }
  }

  /** Per-partition lineage/metrics sidecar (JSON, one file per task).
    * Local-FS write; on a real cluster this path is a shared filesystem
    * (the executor-side write pattern is identical). */
  private def writeLineage(dir: Option[String], stage: String, rows: Long,
      terms: Long, blocks: Long, bytes: Long, wallMs: Long): Unit =
    dir.foreach { d =>
      val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(-1)
      val f = new java.io.File(s"$d/$stage")
      f.mkdirs()
      val json = s"""{"stage":"$stage","partition":$pid,"rows":$rows,"terms":$terms,""" +
        s""""blocks":$blocks,"encodedBytes":$bytes,"wallMillis":$wallMs}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/$stage/part-$pid.json"), json)
    }

  // ---- persistence with stage-commit markers (resume support) ------------

  private def stageDone(dir: String, stage: String): Boolean =
    new java.io.File(s"$dir/_COMMITTED_$stage").exists()

  private def commitStage(dir: String, stage: String): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_COMMITTED_$stage"),
      System.currentTimeMillis().toString)

  /** Build and persist, stage by stage, skipping stages whose commit
    * marker already exists — the checkpoint/resume discipline (mirrors
    * the importer's atomic `.tmp`→rename + skip of committed shards,
    * reference importer.go:233-239,452-465). Returns the number of stages
    * actually executed (0 on a fully-resumed build). */
  def buildPersistent(spark: SparkSession, docs: DataFrame, dir: String,
      cfg0: Config = Config()): Int = {
    import spark.implicits._
    val cfg = cfg0.copy(lineageDir = Some(s"$dir/_lineage"))
    new java.io.File(dir).mkdirs()
    var ran = 0

    if (!stageDone(dir, "docmap")) {
      val withIds = assignDocIds(spark, docs, cfg.partitions).cache()
      val nDocs = withIds.count()
      val dps = cfg.docsPerShard
      val docmap = withIds.map { case (id, url, text, lang) =>
        DocEntry(id, url, (id / dps).toInt, Text.tokenize(text).length, lang)
      }
      docmap.write.mode(SaveMode.Overwrite).parquet(s"$dir/docmap")
      withIds.map { case (id, url, text, lang) => (id, url, text, lang) }
        .toDF("docId", "url", "text", "lang")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")
      val avgdl = spark.read.parquet(s"$dir/docmap").agg(avg("dl")).as[Double].head()
      val nShards = math.max(1, (nDocs + dps - 1) / dps).toInt
      writeMeta(s"$dir/meta.json",
        IndexMeta(nDocs, avgdl, dps, nShards, cfg.blockSize, hasPositions = true))
      commitStage(dir, "docmap"); ran += 1
      withIds.unpersist()
    }

    val meta = readMeta(s"$dir/meta.json")
    lazy val withIds = spark.read.parquet(s"$dir/docs")
      .as[(Long, String, String, String)]

    if (!stageDone(dir, "docnorms")) {
      spark.read.parquet(s"$dir/docmap").as[DocEntry]
        .groupByKey(_.shard)
        .mapGroups { (shard, it) =>
          val entries = it.map(d => (d.docId, d.dl)).toArray.sortBy(_._1)
          DocNorms(shard, shard.toLong * meta.docsPerShard, entries.length,
            Varint.encodeInts(entries.map(_._2)))
        }
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/docnorms")
      commitStage(dir, "docnorms"); ran += 1
    }

    if (!stageDone(dir, "postings")) {
      encodeTokenPostings(spark, withIds, meta.docsPerShard, cfg)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/postings")
      commitStage(dir, "postings"); ran += 1
    }

    if (!stageDone(dir, "termstats")) {
      spark.read.parquet(s"$dir/postings")
        .groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxTf").as("maxTf"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/termstats")
      commitStage(dir, "termstats"); ran += 1
    }

    if (cfg.buildTrigrams && !stageDone(dir, "trigrams")) {
      encodeTriPostings(spark, withIds, meta.docsPerShard, cfg)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/trigrams")
      commitStage(dir, "trigrams"); ran += 1
    }
    ran
  }

  def load(spark: SparkSession, dir: String): BuiltIndex = {
    import spark.implicits._
    val meta = readMeta(s"$dir/meta.json")
    val tri =
      if (stageDone(dir, "trigrams")) Some(spark.read.parquet(s"$dir/trigrams").as[TriBlock])
      else None
    BuiltIndex(
      meta,
      spark.read.parquet(s"$dir/docmap").as[DocEntry],
      spark.read.parquet(s"$dir/docnorms").as[DocNorms],
      spark.read.parquet(s"$dir/postings").as[PostingBlock],
      tri,
      spark.read.parquet(s"$dir/termstats").as[TermStats])
  }

  def writeMeta(path: String, m: IndexMeta): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      s"""{"nDocs":${m.nDocs},"avgdl":${m.avgdl},"docsPerShard":${m.docsPerShard},""" +
        s""""nShards":${m.nShards},"blockSize":${m.blockSize},""" +
        s""""hasPositions":${m.hasPositions},"version":${m.version}}""")

  def readMeta(path: String): IndexMeta = {
    val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    def f(k: String): String =
      s.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}')
    IndexMeta(f("nDocs").toLong, f("avgdl").toDouble, f("docsPerShard").toLong,
      f("nShards").toInt, f("blockSize").toInt, f("hasPositions").toBoolean,
      f("version").toInt)
  }
}
