package graft.corpus

import java.sql.Timestamp
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.Text

/** One Common-Crawl-style web page (the `input_hint` schema). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic web-page corpus (FIXTURES.md §1).
  *
  * Every field is a pure function of (seed, rowIndex) — never of the
  * partition — so the table is byte-identical at every parallelism level.
  * Planted markers give known posting lists for golden tests:
  *  - `qmarkerK` appears exactly in docs { i : i % 1009 == K }, K = 0..9
  *  - `needlealpha` planted once in doc 137
  *  - bigram "data processing" planted in docs { i : i % 211 == 5 }
  *  - rank-0 vocab word "the" is stopword-frequent (hot-term skew fixture)
  */
object PageGen {

  val Seed: Long = 42L
  val VocabSize: Int = 10000

  /** Deterministic pseudo-vocabulary; rank 0..2 are real stopwords so the
    * Zipf head behaves like one. */
  val vocab: Array[String] = {
    val syll = Array("ba", "ri", "ko", "ta", "lu", "me", "zo", "pi", "sa",
      "du", "ve", "no", "ka", "ti", "ru", "ge", "fo", "li", "wa", "su")
    val out = new Array[String](VocabSize)
    out(0) = "the"; out(1) = "of"; out(2) = "and"
    var i = 3
    while (i < VocabSize) {
      // base-20 expansion of i over syllables (1-4 syllables for i in [3, 9999])
      var v = i; val sb = new StringBuilder
      do { sb.append(syll(v % 20)); v /= 20 } while (v > 0)
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** SplitMix64 — splittable, counter-free determinism keyed by (seed, i). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state += 0x9e3779b97f4a7c15L; mix64(state) }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
  }

  /** Zipf(~1) rank via log-uniform inverse CDF. */
  private def zipfRank(r: Rng): Int = {
    val u = r.nextDouble()
    math.min(VocabSize - 1, math.pow(VocabSize.toDouble, u).toInt - 1).max(0)
  }

  def base36(i: Long): String = java.lang.Long.toString(i, 36)

  def url(i: Long): String = s"https://host${i % 97}.example/${base36(i)}"

  def lang(i: Long): String =
    if (i % 20 == 19) { if ((i / 20) % 2 == 0) "de" else "fr" } else "en"

  /** Generate page i. html is built first; text = Text.extractText(html)
    * (the per-row byte-identity invariant holds by construction and is
    * asserted in tests). */
  def page(i: Long): Page = {
    val r = new Rng(mix64(Seed ^ i))
    val titleLen = 3 + r.nextInt(4)
    val title = Array.fill(titleLen)(vocab(zipfRank(r))).mkString(" ")
    val nTokens = 20 + r.nextInt(381)
    val nParas = 1 + r.nextInt(5)
    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    var left = nTokens
    for (p <- 0 until nParas) {
      val take = if (p == nParas - 1) left else math.max(1, left / (nParas - p))
      val words = Array.fill(math.max(1, take))(vocab(zipfRank(r)))
      paras += words.mkString(" ")
      left -= take
    }
    val k = i % 1009
    if (k < 10) paras += s"qmarker$k section"
    if (i % 211 == 5) paras += "about data processing pipelines"
    if (i == 137L) paras += "identifier needleAlpha appears here"
    val html = new StringBuilder
    html.append("<html><head><title>").append(title).append("</title></head><body>")
    paras.foreach(p => html.append("<p>").append(p).append("</p>"))
    html.append("</body></html>")
    val htmlBytes = html.toString.getBytes(StandardCharsets.UTF_8)
    Page(url(i), new Timestamp(1735689600000L + i * 1000L), htmlBytes,
      Text.extractText(htmlBytes), lang(i))
  }

  /** Distributed deterministic generation: one row per index, generation
    * keyed by the index (never the partition). */
  def pages(spark: SparkSession, n: Long, parallelism: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism).map(i => page(i))
  }
}
