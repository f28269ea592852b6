package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst column expressions (codegen'd, no UDFs) and reproducible in
  * an SQL oracle.
  */
object TextAnalysis {

  /** Stopword evidence lists per language (tiny, deterministic). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que", "por", "con"))

  private def toks(textCol: org.apache.spark.sql.Column) =
    graft.functions.Text.tokensCol(textCol)

  /** N-gram/stopword-heuristic language ID: score per language = number of
    * tokens that are stopwords of that language; argmax wins, ties broken
    * by language code order, zero evidence → "und" (undetermined).
    * Pure per-row expressions — no explode/groupBy: the old shuffle
    * version also silently DROPPED token-less docs (empty/punctuation-only
    * text produced no exploded rows, so no output row at all, violating
    * the "zero evidence → und" contract; code-review r05). One output row
    * per input row, zero shuffles. */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val langs = stopwords.keys.toSeq.sorted
    val scored = docs.select(col(idCol) +: langs.map(l =>
      size(filter(t, x => x.isin(stopwords(l): _*))).cast("long").as(s"s_$l")): _*)
    // argmax with deterministic tiebreak: first language in sorted code
    // order reaching the max wins (build the WHEN chain in that order)
    val maxScore = greatest(langs.map(l => col(s"s_$l")): _*)
    val pickOrdered = langs.reverse.foldLeft(lit("und")) { (acc, l) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
    scored.select(col(idCol), pickOrdered.as("lang_pred"), maxScore.as("evidence"))
  }

  /** Quality signals: length, token stats, punctuation/digit/stopword
    * ratios and a combined keep/drop heuristic (Gopher/C4-style gates). */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t)
    // raw values drive the keep gate; rounding happens only at output so
    // thresholds compare on the same value as the SQL oracle
    val meanLen = aggregate(t, lit(0.0d), (a, x) => a + length(x)) /
      greatest(nTok.cast("double"), lit(1.0d))
    val allStop = stopwords.values.flatten.toSeq.distinct
    val stopRatio = size(filter(t, x => x.isin(allStop: _*))).cast("double") /
      greatest(nTok.cast("double"), lit(1.0d))
    val digitRatio = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[0-9]", ""))).cast("double") /
      greatest(length(col(textCol)).cast("double"), lit(1.0d))
    val punctRatio = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[.,;:!?]", ""))).cast("double") /
      greatest(length(col(textCol)).cast("double"), lit(1.0d))
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_m"),
      nTok.as("n_tokens"),
      round(meanLen, 5).as("mean_tok_len"),
      round(stopRatio, 5).as("stop_ratio"),
      round(digitRatio, 5).as("digit_ratio"),
      round(punctRatio, 5).as("punct_ratio"),
      (length(col(textCol)) >= 50 && nTok >= 10 &&
        meanLen >= 2.0 && meanLen <= 12.0 && digitRatio < 0.3).as("keep"))
  }

  /** Token counting: whitespace tokens vs BPE-ish subword count estimate
    * (word-piece regex: runs of letters / digits / single punct marks,
    * long words counted as ceil(len/6) pieces). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ws = size(filter(split(col(textCol), "\\s+"), t => t =!= lit("")))
    val pieces = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= lit(""))
    val bpeish = aggregate(pieces, lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 6.0).cast("long"))
    docs.select(col(idCol), ws.as("ws_tokens"), bpeish.as("bpe_est_tokens"))
  }

  /** Winnowing-style document fingerprint: minimum md5 over character
    * 8-grams — robust to token reordering, cheap to compare across docs. */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      gram: Int = 8): DataFrame = {
    val s = lower(col(textCol))
    val n = greatest(length(s) - (gram - 1), lit(1))
    val grams = transform(sequence(lit(1), n), i => md5(substr(s, i, lit(gram))))
    docs.select(col(idCol), array_min(grams).as("fingerprint"))
  }
}
