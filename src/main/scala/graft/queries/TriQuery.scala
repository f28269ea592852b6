package graft.queries

/** Boolean trigram query: Op ∈ {All, None, And, Or} with a trigram set and
  * sub-queries — the conservative candidate-document query a regexp
  * compiles to. New Scala implementation of the algebra in Russ Cox's
  * "Regular Expression Matching with a Trigram Index" as used by the
  * reference (`/root/reference/internal/index/regexp.go:22-281`): boolean
  * simplification via implication, single-child unwrapping, atom merging
  * and common-factor extraction, so queries stay small.
  */
object TriQuery {
  sealed abstract class Op
  case object QAll extends Op
  case object QNone extends Op
  case object QAnd extends Op
  case object QOr extends Op

  val all: TriQuery = TriQuery(QAll, Vector.empty, Vector.empty)
  val none: TriQuery = TriQuery(QNone, Vector.empty, Vector.empty)

  /** whether (AND of trigrams t) implies q. */
  def trigramsImply(t: Vector[String], q: TriQuery): Boolean = q.op match {
    case QOr =>
      q.sub.exists(qq => trigramsImply(t, qq)) ||
        t.exists(x => StringSets.isSubsetOf(Vector(x), q.trigram))
    case QAnd =>
      q.sub.forall(qq => trigramsImply(t, qq)) &&
        StringSets.isSubsetOf(q.trigram, t)
    case _ => false
  }
}

final case class TriQuery(
    op: TriQuery.Op,
    trigram: Vector[String],
    sub: Vector[TriQuery]) {
  import TriQuery._

  def and(r: TriQuery): TriQuery = andOr(r, QAnd)
  def or(r: TriQuery): TriQuery = andOr(r, QOr)

  private def isAtom: Boolean = trigram.size == 1 && sub.isEmpty

  def andOr(r0: TriQuery, op: Op): TriQuery = {
    var q = this
    var r = r0
    if (q.trigram.isEmpty && q.sub.size == 1) q = q.sub.head
    if (r.trigram.isEmpty && r.sub.size == 1) r = r.sub.head

    // boolean simplification: if q ⇒ r then q AND r ≡ q and q OR r ≡ r
    if (q.implies(r)) return if (op == QAnd) q else r
    if (r.implies(q)) return if (op == QAnd) r else q

    val qAtom = q.isAtom
    val rAtom = r.isAtom
    if (q.op == op && (r.op == op || rAtom))
      return q.copy(trigram = StringSets.union(q.trigram, r.trigram, isSuffix = false),
        sub = q.sub ++ r.sub)
    if (r.op == op && qAtom)
      return r.copy(trigram = StringSets.union(r.trigram, q.trigram, isSuffix = false))
    if (qAtom && rAtom)
      // sorted union, not concat: StringSets.isSubsetOf's monotonic
      // cursor (implies/trigramsImply) and the reference's cleaned
      // Query.String() goldens both require the sorted invariant
      // (code-review r05)
      return TriQuery(op,
        StringSets.union(q.trigram, r.trigram, isSuffix = false), Vector.empty)
    if (q.op == op) return q.copy(sub = q.sub :+ r)
    if (r.op == op) return r.copy(sub = r.sub :+ q)

    // AND of ORs / OR of ANDs: factor out common trigrams:
    //   (abc|def|ghi) AND (abc|def|mno) => (abc|def) OR ((ghi) AND (mno))
    val common = q.trigram.toSet intersect r.trigram.toSet
    if (common.nonEmpty) {
      val q2 = q.copy(trigram = q.trigram.filterNot(common))
      val r2 = r.copy(trigram = r.trigram.filterNot(common))
      val s = q2.andOr(r2, op)
      val otherOp = if (op == QAnd) QOr else QAnd
      val t = TriQuery(otherOp, common.toVector.sorted, Vector.empty)
      return t.andOr(s, otherOp)
    }
    TriQuery(op, Vector.empty, Vector(q, r))
  }

  /** whether q implies r (false negatives allowed). */
  def implies(r: TriQuery): Boolean = {
    if (op == QNone || r.op == QAll) return true
    if (op == QAll || r.op == QNone) return false
    if (op == QAnd || (op == QOr && trigram.size == 1 && sub.isEmpty))
      return TriQuery.trigramsImply(trigram, r)
    if (op == QOr && r.op == QOr && trigram.nonEmpty && sub.isEmpty &&
      StringSets.isSubsetOf(trigram, r.trigram)) return true
    false
  }

  /** AND this query with (OR over strings of (AND of the string's
    * trigrams)). Strings shorter than 3 bytes force ALL (no guarantee). */
  def andTrigrams(t: Vector[String]): TriQuery = {
    if (StringSets.minLen(t) < 3) return this
    var orQ = TriQuery.none
    t.foreach { tt =>
      val trig = StringSets.clean(
        (0 to tt.length - 3).map(i => tt.substring(i, i + 3)).toVector,
        isSuffix = false)
      orQ = orQ.or(TriQuery(QAnd, trig, Vector.empty))
    }
    this.and(orQ)
  }

  /** Printed form matching the reference's Query.String() for golden
    * comparability: ALL = "+", NONE = "-", AND joins with spaces, OR
    * wraps in (..)|(..). */
  override def toString: String = {
    if (op == QNone) return "-"
    if (op == QAll) return "+"
    if (sub.isEmpty && trigram.size == 1) return quote(trigram.head)
    val (pre, sjoin, end, tjoin) =
      if (op == QAnd) ("", " ", "", " ") else ("(", ")|(", ")", "|")
    val sb = new StringBuilder(pre)
    trigram.zipWithIndex.foreach { case (t, i) =>
      if (i > 0) sb.append(tjoin)
      sb.append(quote(t))
    }
    if (sub.nonEmpty) {
      if (trigram.nonEmpty) sb.append(sjoin)
      sb.append(sub.head.toString)
      sub.tail.foreach(s => sb.append(sjoin).append(s.toString))
    }
    sb.append(end)
    sb.toString
  }

  // strconv.Quote-style escapes, so toString stays transcribable against
  // the reference's Query.String() output even when a trigram carries a
  // control character (code-review r05)
  private def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case '\r' => "\\r"
    case c if c > '\u00ff' => f"\\u${c.toInt}%04x" // \xHH is only 2 digits
    case c if c < ' ' || c > '~' => f"\\x${c.toInt}%02x"
    case c => c.toString
  } + "\""

  /** All trigrams referenced anywhere in the query (for index scans). */
  def allTrigrams: Set[String] = trigram.toSet ++ sub.flatMap(_.allTrigrams)
}

object StringSets {
  /** suffix ordering: compare from the last byte backwards, shorter first
    * on tie (mirrors the reference's bySuffix). */
  private val bySuffix: Ordering[String] = (s: String, t: String) => {
    var i = 1
    var res = 0
    while (res == 0 && i <= s.length && i <= t.length) {
      val si = s.charAt(s.length - i)
      val ti = t.charAt(t.length - i)
      if (si < ti) res = -1 else if (si > ti) res = 1
      i += 1
    }
    if (res != 0) res else s.length - t.length
  }

  def clean(s: Vector[String], isSuffix: Boolean): Vector[String] = {
    val sorted = if (isSuffix) s.sorted(bySuffix) else s.sorted
    sorted.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == x) acc else acc :+ x
    }
  }

  def union(a: Vector[String], b: Vector[String], isSuffix: Boolean): Vector[String] =
    clean(a ++ b, isSuffix)

  def cross(a: Vector[String], b: Vector[String], isSuffix: Boolean): Vector[String] =
    clean(for { x <- a; y <- b } yield x + y, isSuffix)

  def minLen(s: Vector[String]): Int = if (s.isEmpty) 0 else s.map(_.length).min
  def maxLen(s: Vector[String]): Int = if (s.isEmpty) 0 else s.map(_.length).max

  /** both sorted by prefix order */
  def isSubsetOf(s: Vector[String], t: Vector[String]): Boolean = {
    var j = 0
    s.forall { ss =>
      while (j < t.length && t(j) < ss) j += 1
      j < t.length && t(j) == ss
    }
  }
}
