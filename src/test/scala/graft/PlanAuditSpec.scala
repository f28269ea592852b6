package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PageGen
import graft.index.{IndexBuilder, Search}

/** Physical-plan audits: the properties that keep the engine fast at
  * 100 TB must be visible in the plan — term predicates pushed to the
  * parquet postings scan (the MetaEntry-binary-search analogue, S9) and
  * column pruning on wide tables. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val docs = PageGen.pages(spark, 400, 4).toDF().select("url", "text", "lang")
    IndexBuilder.buildPersistent(spark, docs, d,
      IndexBuilder.Config(docsPerShard = 128, blockSize = 32, partitions = 4))
    d
  }
  lazy val idx = IndexBuilder.load(spark, dir)

  test("term IN (...) predicate is pushed down to the postings parquet scan") {
    val df = Search.topK(spark, idx, Seq("qmarker3", "the"), 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"no term pushdown visible in plan:\n$plan")
  }

  test("trigram IN (...) predicate is pushed down to the trigram scan") {
    val docs = idx.docmap.toDF().selectExpr("docId", "url as text") // shape only
    val df = Search.substring(spark, idx, docs, "qmarker")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(tri"), s"no trigram pushdown:\n$plan")
  }

  test("case-folded substring pushes the variant trigram set to the scan") {
    val docs = idx.docmap.toDF().selectExpr("docId", "url as text") // shape only
    val df = Search.substringNoCase(spark, idx, docs, "QmArKeR")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(tri"), s"no trigram pushdown on the fold path:\n$plan")
  }

  test("in-decode restrict path still pushes term IN (...) to the scan") {
    val restrict = spark.createDataFrame(Seq(Tuple1(1L), Tuple1(2L))).toDF("docId")
    val df = Search.restrictedTfRows(spark, idx, Seq("the", "qmarker3"), restrict)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(term"), s"no term pushdown on the restrict path:\n$plan")
  }

  test("suffix wildcard is a rev-prefix range on the reversed dictionary") {
    import org.apache.spark.sql.functions.col
    assert(idx.revdict.isDefined, "persisted index should carry revterms")
    // identity: reversed-dictionary expansion == fallback endsWith scan
    val viaRev = Search.expandSuffix(spark, idx, "r3")
    val viaScan = Search.expandSuffix(spark, idx.copy(revdict = None), "r3")
    assert(viaRev == viaScan && viaRev == Seq("qmarker3"))
    // the suffix becomes StringStartsWith on the rev-sorted parquet —
    // file/row-group-prunable, unlike EndsWith on the forward dictionary
    val df = idx.revdict.get.filter(col("rev").startsWith("3r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(rev"),
      s"no rev-prefix pushdown visible:\n$plan")
  }

  test("fuzzy/suggest use the deletion-neighborhood dictionary (key IN pushdown)") {
    import org.apache.spark.sql.functions.col
    assert(idx.deldict.isDefined, "persisted index should carry delterms")
    // identity: deldict expansion == fallback levenshtein dictionary scan
    val viaDel = Search.expandFuzzy(spark, idx, "qmarker3", maxDist = 1)
    val viaScan = Search.expandFuzzy(spark, idx.copy(deldict = None), "qmarker3", maxDist = 1)
    assert(viaDel == viaScan && viaDel.contains("qmarker3"))
    val sDel = Search.suggest(spark, idx, "qmarker3x", maxDist = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val sScan = Search.suggest(spark, idx.copy(deldict = None), "qmarker3x", maxDist = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(sDel == sScan && sDel.nonEmpty)
    // the lookup is a key IN (...) on the key-sorted parquet — pushed to
    // the scan (file/row-group-prunable), never a full-dictionary pass
    val keys = graft.functions.Text.deletionVariants("qmarker3", 1).toSeq
    val df = idx.deldict.get.filter(col("key").isin(keys: _*))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(key"), s"no deldict key pushdown visible:\n$plan")
    // a query longer than DelDictMaxQueryLen takes the scan fallback —
    // its own deletion neighborhood would be an O(len²)-literal IN
    // expression on the driver (code-review r05)
    val long = "q" * (IndexBuilder.DelDictMaxQueryLen + 1)
    assert(Search.expandFuzzy(spark, idx, long, maxDist = 1).isEmpty)
  }

  test("deldict lookup finds short terms whose only common deletion is empty") {
    // FastSS completeness at the boundary: "a"~"b" (lev=1) share ONLY the
    // empty string as a deletion variant — a deldict that never shrinks a
    // term to the empty key silently misses them while the fallback scan
    // does not (code-review r05). Toy dictionary, corpus-independent.
    import spark.implicits._
    import graft.index.TermStats
    val toyStats = Seq(TermStats("a", 1L, 1L, 1), TermStats("b", 2L, 2L, 1),
      TermStats("xy", 1L, 1L, 1)).toDS()
    val toy = idx.copy(termstats = toyStats,
      deldict = Some(IndexBuilder.deldictOf(spark, toyStats.toDF().select("term"))))
    val viaDel = Search.expandFuzzy(spark, toy, "a", maxDist = 1)
    val viaScan = Search.expandFuzzy(spark, toy.copy(deldict = None), "a", maxDist = 1)
    assert(viaDel == Seq("a", "b") && viaDel == viaScan)
    val s = Search.suggest(spark, toy, "a", maxDist = 1, k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(s == Seq(("a", 0, 1L), ("b", 1, 2L)))
  }

  test("languageId plans zero exchanges (per-row expressions, r05)") {
    // the pre-r05 explode+groupBy form shuffled every token; the per-row
    // form must stay a pure map — a reintroduced Exchange is a 100 TB
    // regression even if results stay correct
    val docs = idx.docmap.toDF().selectExpr("docId as doc_id", "url as text")
    val plan = graft.operators.TextAnalysis.languageId(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"languageId shuffles:\n$plan")
  }

  test("docmap reads prune the text column") {
    val df = graft.queries.QueryRunner.run(spark, idx, "qmarker3 lang:de", 10)
    val plan = df.queryExecution.executedPlan.toString
    // every parquet scan in the query plan must avoid reading `text`
    // (the docs table carries it; queries only need ids/urls/norms)
    val scans = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(scans.nonEmpty)
    scans.foreach(s => assert(!s.contains("text:string"),
      s"query plan reads the raw text column:\n$s"))
  }

  test("persisted encode stage plans ZERO exchanges (shard-aligned scan, r06)") {
    // the docs files are written shard-aligned (assignDocIds alignTo =
    // docsPerShard), so the combined encode must read them as a pure
    // scan — the (shard)-keyed repartition of the text (the build's only
    // row-level shuffle, VERDICT r05 next-round #1) must not reappear
    import spark.implicits._
    val docText = spark.read.parquet(s"$dir/docs")
      .select("docId", "text").as[(Long, String)]
    val cfg = IndexBuilder.Config(docsPerShard = 128, blockSize = 32, partitions = 4)
    val plan = IndexBuilder.encodeCombined(spark, docText, 128, cfg, aligned = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"aligned encode shuffles:\n$plan")
  }

  test("in-memory build: ONE exchange total — id assignment; encode adds none (r06)") {
    val docs = PageGen.pages(spark, 300, 4).toDF().select("url", "text", "lang")
    val cfg = IndexBuilder.Config(docsPerShard = 64, blockSize = 16, partitions = 4)
    val built = IndexBuilder.build(spark, docs, cfg)
    // the only exchange anywhere in the build is assignDocIds's range
    // partitioning; the legacy per-family `repartition(shard)` hash
    // exchange of the text must not reappear
    val plan = built.postings.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"encode re-shuffles the text:\n$plan")
    // docnorms folds per-shard runs locally off the same aligned partitions
    val normsPlan = built.docnorms.queryExecution.executedPlan.toString
    assert(!normsPlan.contains("Exchange hashpartitioning"),
      s"docnorms should add no exchange beyond id assignment:\n$normsPlan")
  }

  test("aligned encode emits exactly the legacy shuffled encode's blocks (r06)") {
    import spark.implicits._
    val docs = PageGen.pages(spark, 300, 4).toDF().select("url", "text", "lang")
    val cfg = IndexBuilder.Config(docsPerShard = 64, blockSize = 16, partitions = 4)
    val withIds = IndexBuilder.assignDocIds(spark, docs, cfg.partitions, cfg.docsPerShard)
    val docText = withIds.map { case (id, _, text, _) => (id, text) }
    def key(b: graft.index.PostingBlock) =
      (b.term, b.shard, b.blockId, b.df, b.cf, b.maxTf, b.firstDoc, b.lastDoc,
        b.docs.toSeq, b.tfs.toSeq, b.nPos, b.pos.toSeq, b.posrel.toSeq)
    val aligned = IndexBuilder.encodeTokenPostings(spark, docText, 64, cfg, aligned = true)
      .collect().map(key).toSet
    val legacy = IndexBuilder.encodeTokenPostings(spark, docText, 64, cfg, aligned = false)
      .collect().map(key).toSet
    assert(aligned == legacy)
    // ids themselves: dense rank in url order, every shard whole per task
    val ids = withIds.map(t => (t._1, t._2)).collect().sortBy(_._1)
    assert(ids.map(_._1).toSeq == (0L until 300L))
    assert(ids.map(_._2).toSeq == ids.map(_._2).sorted.toSeq)
  }

  test("whole-stage codegen covers the scoring pipeline (final AQE plan)") {
    val df = Search.bruteForceTopK(spark,
      idx.docmap.toDF().selectExpr("docId", "url as text"), Seq("a"), 5)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // `*(n)` marks operators inside a WholeStageCodegen span
    assert(plan.contains("*("), s"no codegen spans:\n$plan")
    // the scoring join builds broadcast sides, not shuffles
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }
}
