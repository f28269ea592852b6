package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Varint
import graft.plans.GraftFunctions

/** Native decode expressions: correctness (eval + codegen paths agree
  * with the codec) and plan shape (decode stays inside codegen — no
  * object serialization boundary). */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_decode_docids / graft_decode_tfs round-trip the codec") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(50) { i =>
      val docs = Array.fill(1 + rnd.nextInt(200))(rnd.nextInt(100000)).distinct.sorted
      val tfs = docs.map(_ => 1 + rnd.nextInt(30))
      (i, Varint.encodeDeltas(docs), Varint.encodeInts(tfs), docs.length, 1000L * i, docs, tfs)
    }
    val df = rows.map(r => (r._1, r._2, r._3, r._4, r._5)).toDF("id", "docs", "tfs", "df", "base")
    val out = df.select(col("id"),
      call_function("graft_decode_docids", col("docs"), col("df"), col("base")).as("d"),
      call_function("graft_decode_tfs", col("tfs"), col("df")).as("t"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1), r.getSeq[Int](2))).sortBy(_._1)
    rows.zip(out).foreach { case ((_, _, _, _, base, docs, tfs), (_, d, t)) =>
      assert(d == docs.map(base + _).toSeq)
      assert(t == tfs.toSeq)
    }
  }

  test("GraftExtensions injects the decode functions via SparkSessionExtensions") {
    // apply the extension to a standalone extensions container; the
    // function-builder path itself is exercised by the tests above
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    // and a session-level smoke: the registered names resolve in SQL
    GraftFunctions.register(spark)
    val r = spark.sql(
      s"SELECT graft_decode_docids(X'0305', 2, CAST(10 AS BIGINT)) AS d").head()
    assert(r.getSeq[Long](0) == Seq(13L, 18L)) // deltas 3,5 + base 10
  }

  test("graft_dot equals aggregate(zip_with(...)) bit-for-bit and stays in codegen") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(200)(i =>
      (i, Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
      call_function("graft_dot", col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getInt(0)}") // exact, not approx
    }
    // a LocalTableScan collapses the projection and AQE hides the final
    // plan until execution — run the query, then read the executed plan
    val q = df.repartition(2).select(call_function("graft_dot", col("a"), col("b")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // "*(n) Project" is the whole-stage-codegen marker in plan toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"), plan)
  }

  test("scoreDocs plan decodes inside codegen (no object serialization)") {
    val idx = EngineFixtures.idx(spark)
    val df = graft.queries.QueryRunner.scoreDocs(spark, idx, Seq("the", "qmarker5"), None)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("SerializeFromObject"),
      s"decode path fell back to object serialization:\n$plan")
    assert(plan.contains("graft_decode_docids") || plan.contains("decodedocids") ||
      plan.toLowerCase.contains("decode"), s"expected decode expressions in plan:\n$plan")
  }
}

/** Shared small PERSISTED+loaded index for expression/plan tests —
  * loaded-from-parquet lineage, so plan audits see the production scan
  * shape (a freshly-built in-memory index carries its own
  * SerializeFromObject from the builder's mapPartitions). */
object EngineFixtures {
  @volatile private var cached: graft.index.BuiltIndex = _
  def idx(spark: org.apache.spark.sql.SparkSession): graft.index.BuiltIndex = {
    if (cached == null) synchronized {
      if (cached == null) {
        val dir = java.nio.file.Files.createTempDirectory("graft-exprfix").toString
        val docs = graft.corpus.PageGen.pages(spark, 300, 4).toDF()
          .select("url", "text", "lang")
        graft.index.IndexBuilder.buildPersistent(spark, docs, dir,
          graft.index.IndexBuilder.Config(docsPerShard = 64, blockSize = 16,
            partitions = 4, buildTrigrams = false))
        cached = graft.index.IndexBuilder.load(spark, dir)
      }
    }
    cached
  }
}
