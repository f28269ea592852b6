package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Brute-force cosine is the exact baseline; the scale
  * path is LSH bucketing by random-hyperplane signs so only same-bucket
  * pairs are compared (candidate volume drops ~2^planes-fold).
  *
  * Dot products use `aggregate(zip_with(...))` — pure codegen'd Catalyst
  * expressions, no UDFs, so the whole pipeline stays whole-stage-codegen
  * and oracle-checkable in SQL.
  */
object Similarity {

  /** Dot product via the native ArrayDot expression (one codegen'd
    * multiply-accumulate loop, no intermediate array — same fold order as
    * `aggregate(zip_with(...))`, so results are bit-identical). Callers
    * must have run `GraftFunctions.register` on the session. */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(call_function("graft_dot", a, a))

  /** Exact brute-force cosine top-k neighbors for each query vector.
    * Query side is small → broadcast; one pass over the corpus, top-k via
    * per-query window rank (TakeOrdered per group). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    // cast to double BEFORE multiplying: float*float would round to
    // float32 while the SQL oracle multiplies doubles. Norms are hoisted
    // to one column per vector so the pair loop runs a single aggregate.
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("cn", norm(col("cvec")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .withColumn("cosine",
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 5))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplanes derived from md5("p:i"):
    * first 8 hex digits → uniform [0,1) → component u−0.5. Computed once
    * on the driver and inlined as literals, so an SQL oracle can embed
    * the exact same constants. */
  def hyperplanes(dim: Int, planes: Int): Array[Array[Double]] =
    saltedPlanes("", planes, dim)

  /** md5("<salt><p>:<i>") → first 8 hex digits → uniform [0,1) → u−0.5.
    * One definition for both plane families so the uniform-mapping
    * arithmetic can never diverge between LSH buckets and IVF cells
    * (code-review r05). */
  private def saltedPlanes(salt: String, n: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n, dim) { (p, i) =>
      md.reset()
      val hex = md.digest(s"$salt$p:$i".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }

  /** Random-hyperplane LSH bucket id: sign bits over the hyperplanes.
    * Each plane's dot runs through the native graft_dot loop against a
    * literal hyperplane array — same ascending-index fold order as the
    * per-element expression sum (bit-identical buckets, SQL-reproducible).
    * Callers must have run `GraftFunctions.register` on the session. */
  def lshBucket(vecCol: org.apache.spark.sql.Column, hp: Array[Array[Double]]) = {
    val bits = hp.zipWithIndex.map { case (w, p) =>
      val d = call_function("graft_dot", vecCol.cast("array<double>"), typedLit(w.toSeq))
      when(d >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic anchor vectors for the IVF coarse quantizer — like
    * [[hyperplanes]] but salted separately. Data-independent so the SQL
    * oracle can inline them; production callers pass k-means centroids
    * from [[kmeansCentroids]] instead. */
  def ivfAnchors(dim: Int, k: Int): Array[Array[Double]] =
    saltedPlanes("ivf:", k, dim)

  /** Deterministic Lloyd k-means (fixed iterations, evenly-spaced init
    * over the id-ordered sample) — the production IVF trainer. Runs
    * driver-side on a bounded sample, the standard IVF practice; the
    * resulting centroids broadcast into [[ivfCosineTopK]] as literals. */
  def kmeansCentroids(emb: DataFrame, k: Int = 8, iters: Int = 5,
      sampleN: Int = 1024, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = emb
      .orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty)
    val dim = sample.head.length
    var cents = Array.tabulate(k)(j => sample((j.toLong * sample.length / k).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - cents(j)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k)(j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(_ / counts(j)))
    }
    cents
  }

  /** Ranked cell list of a vector: argmin-sorted (distance, cell) pairs.
    * Distance surrogate per cell j: |c_j|² − 2·v·c_j (the |v|² term is
    * common to all cells). sort_array on (s, j) structs breaks ties by
    * the smaller cell id — reproducible in SQL with list_sort. */
  private def cellRanking(vecCol: org.apache.spark.sql.Column,
      cents: Array[Array[Double]]) = {
    val entries = cents.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (lit(c2) - lit(2.0) * call_function("graft_dot",
          vecCol.cast("array<double>"), typedLit(c.toSeq))).as("s"),
        lit(j).as("j"))
    }
    sort_array(array(entries: _*))
  }

  /** Cell id (nearest anchor/centroid) of each vector. */
  def ivfCell(vecCol: org.apache.spark.sql.Column, cents: Array[Array[Double]]) =
    cellRanking(vecCol, cents).getItem(0).getField("j")

  /** IVF ANN: corpus vectors live in their nearest cell; each query
    * probes its `nprobe` nearest cells and runs exact cosine only there —
    * candidate volume drops ~k/nprobe-fold, the shuffle is an equi-join
    * on the cell id. Pass [[kmeansCentroids]] output for trained cells or
    * [[ivfAnchors]] for the deterministic data-independent quantizer
    * (the oracle-tested default). Recall < 1 by construction. */
  def ivfCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[Array[Double]], nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("cell", ivfCell(col("cvec"), cents))
      .withColumn("cn", norm(col("cvec")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("cell", explode(slice(
        cellRanking(col("qvec"), cents).getField("j"), 1, nprobe)))
      .withColumn("qn", norm(col("qvec")))
    val scored = c.join(broadcast(q), "cell")
      .filter(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .withColumn("cosine",
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 5))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** LSH-bucketed ANN: exact cosine but only within matching buckets.
    * The shuffle is an equi-join on the bucket id instead of a cross
    * join — the 100 TB-scale path. Recall < 1 by construction; bump
    * `planes` down or add band rotations for higher recall. */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val hp = hyperplanes(dim, planes)
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), hp))
      .withColumn("cn", norm(col("cvec")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), hp))
      .withColumn("qn", norm(col("qvec")))
    val scored = c.join(broadcast(q), "bucket")
      .filter(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .withColumn("cosine",
        round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 5))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }
}
