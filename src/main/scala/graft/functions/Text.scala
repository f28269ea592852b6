package graft.functions

import java.nio.charset.StandardCharsets

/** Tokenization, byte-trigram extraction and HTML→text extraction.
  *
  * These are the frozen "ingest gate" functions of the engine — the
  * analogue of dcs's UTF-8 validation + size limits
  * (reference `/root/reference/internal/index/write.go:123-220`). Their
  * behavior is pinned by golden tests; changing them changes docIds,
  * postings and scores everywhere.
  */
object Text {

  /** The canonical Column-level tokenizer — lowercased [a-z0-9]+ runs.
    * ONE definition so shingles, simhash, fingerprints, language ID and
    * quality scoring can never tokenize differently (code-review r05:
    * three private copies of this expression had already appeared).
    * Mirrors the JVM-side [[tokenize]]/[[countTokens]]. */
  def tokensCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{filter, lit, lower, split}
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= lit(""))
  }

  /** Tokens = maximal runs of [a-z0-9] over the lowercased text.
    * Equivalent to SQL `regexp_split_to_array(lower(text), '[^a-z0-9]+')`
    * minus empties — chosen so a DuckDB oracle can reproduce it exactly.
    * ASCII-only token alphabet; non-ASCII letters act as separators
    * (they never match [a-z0-9] after lowercasing).
    */
  def tokenize(text: String): Array[String] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += s.substring(start, i)
      } else i += 1
    }
    out.toArray
  }

  /** (token, tokenPosition) pairs; position = 0-based token index. */
  def tokenizeWithPositions(text: String): Array[(String, Int)] = {
    val toks = tokenize(text)
    Array.tabulate(toks.length)(i => (toks(i), i))
  }

  /** True iff every char is < 0x80. ASCII text admits the zero-copy
    * tokenization fast paths (per-char `|0x20` lowercasing is exact for
    * ASCII); anything else falls back to the String.toLowerCase-based
    * reference implementations so exotic case mappings (Kelvin sign,
    * dotted İ) keep byte-identical semantics. */
  def isAscii(text: String): Boolean = {
    var i = 0
    val n = text.length
    while (i < n) { if (text.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  /** Token count == tokenize(text).length, allocation-free on ASCII text
    * (no lowercased copy, no token array/substrings) — the docmap stage's
    * `dl` column at web scale is this loop. */
  def countTokens(text: String): Int = {
    if (!isAscii(text)) return tokenize(text).length
    val n = text.length
    var i = 0
    var count = 0
    while (i < n) {
      val c = text.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')) {
        count += 1
        i += 1
        while (i < n && {
          val d = text.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9') || (d >= 'A' && d <= 'Z')
        }) i += 1
      } else i += 1
    }
    count
  }

  // ---- byte trigrams (dcs semantics) -------------------------------------

  /** The all-spaces trigram 0x202020, excluded from positional sections
    * only (reference write.go:346, merge.go:366,432). */
  val AllSpaces: Int = 0x202020

  /** Rolling 24-bit byte-trigram extraction over the UTF-8 bytes of text:
    * `tv = (tv<<8 | c) & 0xFFFFFF` emitted from the 3rd byte on
    * (reference write.go:180-209). Returns (trigram, byteOffset) for every
    * occurrence; byteOffset = offset of the trigram's FIRST byte.
    */
  def trigramsWithOffsets(text: String): Array[(Int, Int)] = {
    val b = text.getBytes(StandardCharsets.UTF_8)
    if (b.length < 3) return Array.empty
    val out = new Array[(Int, Int)](b.length - 2)
    var tv = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    var i = 2
    while (i < b.length) {
      tv = ((tv << 8) | (b(i) & 0xff)) & 0xffffff
      out(i - 2) = (tv, i - 2)
      i += 1
    }
    out
  }

  /** Hex form of a trigram (6 uppercase hex digits) — the join key used
    * when an SQL oracle must reproduce byte trigrams via
    * `hex(substring(encode(text), i, 3))`. */
  def trigramHex(t: Int): String = f"$t%06X"

  /** All strings obtainable from `s` by deleting up to `maxDel` characters
    * (including `s` itself), distinct, deterministic order. The key set of
    * the deletion-neighborhood dictionary (the FastSS/SymSpell scheme): if
    * levenshtein(a, b) <= d then the <=d-deletion neighborhoods of a and b
    * intersect, so a dictionary keyed by term deletion variants answers a
    * fuzzy lookup with O(|variants(query)|) point lookups — a SUPERSET
    * candidate generator; callers re-filter with the exact edit distance.
    * Size is O(len^maxDel) per term (~1 + L + L²/2 at maxDel=2). */
  def deletionVariants(s: String, maxDel: Int): Array[String] = {
    val out = new java.util.LinkedHashSet[String]()
    out.add(s)
    var frontier = Array(s)
    var d = 0
    while (d < maxDel && frontier.nonEmpty) {
      val next = new java.util.LinkedHashSet[String]()
      frontier.foreach { v =>
        // length-1 strings MUST shrink to the empty key: two terms within
        // distance d can share ONLY the empty string as a common deletion
        // (e.g. "a"~"b" at d=1), so dropping it breaks the FastSS
        // completeness bound — the dictionary lookup would miss matches
        // the fallback scan returns (code-review r05)
        var i = 0
        while (i < v.length) {
          val w = v.substring(0, i) + v.substring(i + 1)
          if (out.add(w)) next.add(w)
          i += 1
        }
      }
      frontier = next.toArray(new Array[String](next.size))
      d += 1
    }
    out.toArray(new Array[String](out.size))
  }

  // ---- ingest gates (F1/F2 analogues) ------------------------------------

  val MaxFileLen: Long = 1L << 30 // 1 GiB (write.go:143)
  val MaxLineLen: Int = 2000 // write.go:145
  val MaxTextTrigrams: Int = 20000 // write.go:147

  /** Document admission rule, mirroring dcs's text-detection limits
    * (write.go:143-147,163-214): ≥3 bytes, ≤1 GiB, no line longer than
    * 2000 bytes, ≤20k distinct trigrams. (UTF-8 validity is implied for
    * String inputs.) */
  def indexable(text: String): Boolean =
    indexableReusing(text, new java.util.BitSet(1 << 24))

  /** Allocation-free variant for hot loops: the caller supplies the
    * 2 MiB distinct-trigram bitset, reused across documents. */
  def indexableReusing(text: String, seen: java.util.BitSet): Boolean =
    if (isAscii(text)) indexableAscii(text, seen)
    else indexableBytes(text.getBytes(StandardCharsets.UTF_8), seen)

  /** ASCII fast path: chars ARE the UTF-8 bytes, so the gate runs with no
    * byte-array copy at all. */
  def indexableAscii(text: String, seen: java.util.BitSet): Boolean = {
    val n = text.length
    if (n < 3 || n > MaxFileLen) return false
    var lineLen = 0
    var i = 0
    while (i < n) {
      if (text.charAt(i) == '\n') lineLen = 0
      else { lineLen += 1; if (lineLen > MaxLineLen) return false }
      i += 1
    }
    seen.clear()
    var distinct = 0
    var tv = (text.charAt(0) << 8) | text.charAt(1)
    i = 2
    while (i < n) {
      tv = ((tv << 8) | text.charAt(i)) & 0xffffff
      if (!seen.get(tv)) { seen.set(tv); distinct += 1; if (distinct > MaxTextTrigrams) return false }
      i += 1
    }
    true
  }

  /** Byte-level gate for callers that already materialized the UTF-8
    * bytes (one getBytes copy instead of two). */
  def indexableBytes(b: Array[Byte], seen: java.util.BitSet): Boolean = {
    if (b.length < 3 || b.length > MaxFileLen) return false
    var lineLen = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == '\n') lineLen = 0
      else { lineLen += 1; if (lineLen > MaxLineLen) return false }
      i += 1
    }
    seen.clear()
    var distinct = 0
    var tv = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    i = 2
    while (i < b.length) {
      tv = ((tv << 8) | (b(i) & 0xff)) & 0xffffff
      if (!seen.get(tv)) { seen.set(tv); distinct += 1; if (distinct > MaxTextTrigrams) return false }
      i += 1
    }
    true
  }

  // ---- html → text (S14 analogue; frozen, byte-identical per url) --------

  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "#39" -> "'")

  /** Pure, frozen HTML→text function: drops tags (and the entire content
    * of script/style elements), decodes the common entities, and joins
    * block-level chunks with '\n'. Deterministic and total — any byte
    * input yields a stable text. The per-row invariant of the engine:
    * text == extractText(html) for every url.
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    val out = new StringBuilder
    val n = s.length
    var i = 0
    var skipUntil: String = null // inside <script>/<style>
    def isBlockTag(name: String): Boolean = name match {
      case "p" | "div" | "br" | "li" | "ul" | "ol" | "h1" | "h2" | "h3" |
           "h4" | "h5" | "h6" | "title" | "head" | "body" | "html" | "tr" |
           "td" | "th" | "table" | "section" | "article" | "header" |
           "footer" | "blockquote" | "pre" => true
      case _ => false
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) { i = n } // unterminated tag: drop rest
        else {
          val inner = s.substring(i + 1, close).trim
          val nameEnd0 = inner.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '/')
          val nameEnd = if (nameEnd0 < 0) inner.length else nameEnd0
          val rawName = inner.substring(0, nameEnd).toLowerCase(java.util.Locale.ROOT)
          val isClosing = rawName.startsWith("/")
          val name = if (isClosing) rawName.drop(1) else rawName
          if (skipUntil != null) {
            if (isClosing && name == skipUntil) skipUntil = null
          } else if (!isClosing && (name == "script" || name == "style")) {
            skipUntil = name
          } else if (isBlockTag(name)) {
            if (out.nonEmpty && out.last != '\n') out.append('\n')
          }
          i = close + 1
        }
      } else if (skipUntil != null) {
        i += 1
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 7 && entities.contains(s.substring(i + 1, semi))) {
          out.append(entities(s.substring(i + 1, semi)))
          i = semi + 1
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    // collapse runs of whitespace-only lines and trim line edges
    out.toString
      .split('\n')
      .iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }
}

/** Vector primitives callable from generated code (see
  * graft.plans.ArrayDot): tight multiply-accumulate over ArrayData with
  * no intermediate array. Fold order = ascending index, matching
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` bit-for-bit. */
object VectorOps {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    // silently truncating to min(len) would compute a cosine over a
    // prefix — a ragged/corrupted row could rank as a top-1 neighbor
    // with no error (code-review r05); dimension mismatch is data
    // corruption, surface it
    require(n == b.numElements(),
      s"graft_dot: dimension mismatch (${n} vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** BM25 parameters and scoring math (replaces dcs's heuristic ranking,
  * reference `ranking/pre-ranking.go:99-102`, per the rebuild's north rule).
  * Lucene-style positive IDF so scores are always ≥ 0.
  */
object BM25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  def idf(df: Long, nDocs: Long): Double =
    math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)

  def score(tf: Int, df: Long, dl: Int, nDocs: Long, avgdl: Double): Double =
    idf(df, nDocs) * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** Upper bound of a term's per-doc score given the max tf in a block —
    * the block-max metadata driving WAND skipping. Monotone in tf and
    * maximized as dl → 0. */
  def maxScore(maxTf: Int, df: Long, nDocs: Long, avgdl: Double): Double =
    idf(df, nDocs) * maxTf * (K1 + 1.0) / (maxTf + K1 * (1.0 - B))
}
