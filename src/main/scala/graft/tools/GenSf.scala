package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator for LARGER sf-shaped test dirs (documents /
  * embeddings / events parquet with the exact driver-testdata schemas and
  * measured distributions of /root/testdata/sf0.1), so the driver bench
  * shape can run at sf1+ without touching the read-only testdata
  * (TESTDATA.md forbids regenerating it; the north rule asks for
  * deterministic small-scale synthesis instead of external data).
  *
  * Measured sf0.1 shape this reproduces: 30-word uniform vocabulary +
  * rare 'dup' (~0.094% of tokens), 10-100 tokens/doc, langs
  * en/zh/es/fr/de at 41/15/15/15/14%, 20 uniform sources; embeddings =
  * 64-dim unit vectors with ~3% planted near-dup pairs; events = 30 days
  * of 5 uniform event types over nUsers users.
  *
  * Usage: runMain graft.tools.GenSf <outDir> [mult] [vocabMode]
  * (mult × sf0.1; vocabMode = "sf" (default, the driver's 30-word
  * vocabulary) or "zipf": 10⁵ distinct terms drawn Zipf(s=1.07) — a
  * realistic webtext vocabulary so shingle/LSH measurements at sf1+
  * stop being distorted by 3-shingle-space saturation of the toy vocab
  * (BENCH/BASELINE.md §6b caveat → §6c).
  */
object GenSf extends Serializable {
  val vocab: Array[String] = Array(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch")
  val langs: Array[(String, Double)] =
    Array(("en", 0.412), ("zh", 0.562), ("es", 0.711), ("fr", 0.860), ("de", 1.0))
  val eventTypes: Array[String] = Array("view", "click", "error", "signup", "purchase")

  /** Zipf(s) sampler over V ranked terms: inverse-CDF binary search on a
    * precomputed cumulative array (built once per executor JVM). Term of
    * rank r is "t"+base36(r) — lowercase alnum, so the tokenizer keeps it
    * whole. s=1.07 is the classic web-corpus exponent. */
  val zipfV = 100000
  val zipfS = 1.07
  lazy val zipfCum: Array[Double] = {
    val c = new Array[Double](zipfV)
    var acc = 0.0
    var r = 0
    while (r < zipfV) { acc += 1.0 / math.pow(r + 1.0, zipfS); c(r) = acc; r += 1 }
    c
  }
  def zipfTerm(u: Double): String = {
    val cum = zipfCum
    val target = u * cum(zipfV - 1)
    var lo = 0; var hi = zipfV - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid) < target) lo = mid + 1 else hi = mid
    }
    "t" + java.lang.Integer.toString(lo, 36)
  }

  private def mix(seed: Long): java.util.Random = {
    // splitmix64 scramble so per-id streams are independent of partitioning
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    new java.util.Random(z ^ (z >>> 31))
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val vocabMode = args.lift(2).getOrElse("sf")
    require(vocabMode == "sf" || vocabMode == "zipf", s"bad vocabMode $vocabMode")
    val zipf = vocabMode == "zipf"
    val nDocs = 5000L * mult
    val nVecs = 2000L * mult
    val nEvents = 100000L * mult
    val nUsers = 1500L * mult
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-gensf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.range(0, nDocs, 1, 64).map { id =>
      val r = mix(id * 7919L + 1L)
      val n = 10 + r.nextInt(91)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.append(
          if (r.nextDouble() < 0.00094) "dup"
          else if (zipf) zipfTerm(r.nextDouble())
          else vocab(r.nextInt(vocab.length)))
        i += 1
      }
      val text = sb.toString
      val u = r.nextDouble()
      val lang = langs.find(u <= _._2).get._1
      (id, text, lang, s"src${r.nextInt(20)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    def unitVec(id: Long): Array[Double] = {
      val r = mix(id * 104729L + 2L)
      val v = Array.fill(64)(r.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    spark.range(0, nVecs, 1, 64).map { id =>
      val base = unitVec(id)
      // ~3% planted near-dups: blend with the previous id's vector so
      // exact/LSH near-dup operators have organic work at every scale
      val v =
        if (id % 33 == 32) {
          val p = unitVec(id - 1)
          val mixd = Array.tabulate(64)(i => p(i) + 0.55 * base(i))
          val nrm = math.sqrt(mixd.map(x => x * x).sum)
          mixd.map(_ / nrm)
        } else base
      val r = mix(id * 15485863L + 3L)
      (id, v.map(_.toFloat).toSeq, r.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    // Instant, not Timestamp.valueOf: the latter reads the DRIVER's
    // default timezone, so two hosts would generate different event
    // times from identical args — breaking determinism (code-review r05)
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    spark.range(0, nEvents, 1, 64).map { id =>
      val r = mix(id * 6700417L + 4L)
      val tsUs = t0 + (r.nextDouble() * 30.0 * 86400e6).toLong
      val value = math.rint(math.exp(r.nextGaussian() * 1.5 + 3.0) * 100) / 100
      (id, tsUs, r.nextLong(nUsers), eventTypes(r.nextInt(eventTypes.length)),
        value, s"""{"k": ${r.nextInt(100)}}""")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    println(s"[gensf] wrote $out: docs=$nDocs vecs=$nVecs events=$nEvents vocab=$vocabMode")
    spark.stop()
  }
}
