package graft.queries

import graft.queries.{Regex => R}
import graft.queries.TriQuery.{QAnd, QOr}

/** regexp → conservative trigram query compiler — the logical optimizer
  * of the query language. New Scala implementation of the analysis
  * algebra from Russ Cox's codesearch as used by the reference
  * (`/root/reference/internal/index/regexp.go:333-711`): every regexp is
  * summarized by (canEmpty, exact | prefix/suffix sets, match query),
  * with set-size caps (maxExact=7, maxSet=20) flushing information into
  * the trigram query as sets grow.
  */
object TrigramCompiler {

  val MaxExact = 7
  val MaxSet = 20

  /** exact == None means "unknown": prefix/suffix describe the matches. */
  final case class Info(
      canEmpty: Boolean,
      exact: Option[Vector[String]],
      prefix: Vector[String],
      suffix: Vector[String],
      matchQ: TriQuery)

  private def anyMatch = Info(canEmpty = true, None, Vector(""), Vector(""), TriQuery.all)
  private def anyChar = Info(canEmpty = false, None, Vector(""), Vector(""), TriQuery.all)
  private def noMatch = Info(canEmpty = false, None, Vector.empty, Vector.empty, TriQuery.none)
  private def emptyString = Info(canEmpty = true, Some(Vector("")), Vector.empty, Vector.empty, TriQuery.all)

  /** Compile a regexp pattern to its trigram query. */
  def compile(pattern: String): TriQuery = {
    val info0 = analyze(R.parse(pattern))
    val info1 = simplify(info0, force = true)
    addExact(info1).matchQ
  }

  def analyze(re: R.Node): Info = {
    val info = re match {
      case R.NoMatch => return noMatch
      case R.Empty | R.Anchor(_) => return emptyString
      case R.Lit(s, fold) =>
        // the empty literal matches the empty string regardless of fold:
        // reporting canEmpty=false would make concat skip unioning the
        // right side's prefix set — an over-narrow (non-conservative)
        // candidate query for direct-AST callers (code-review r05)
        if (s.isEmpty) return emptyString
        if (fold) {
          // case-folded literal = concatenation of per-char folded classes
          return s.foldLeft(emptyString) { (acc, c) =>
            concat(acc, analyze(foldedCharClass(c)))
          }
        }
        Info(canEmpty = false, Some(Vector(s)), Vector.empty, Vector.empty, TriQuery.all)
      case R.AnyChar => return anyChar
      // NB: reduce, not fold-with-zero — alternate(noMatch, x) would turn
      // an exact x into an inexact one and change the emitted query shape
      case R.Cat(subs) =>
        return subs.map(analyze).reduceLeftOption(concat).getOrElse(emptyString)
      case R.Alt(subs) =>
        return subs.map(analyze).reduceLeftOption(alternate).getOrElse(noMatch)
      case R.Quest(sub) => return alternate(analyze(sub), emptyString)
      case R.Star(_) => return anyMatch
      case R.Rep(sub, min, _) =>
        if (min == 0) return anyMatch
        return plusLike(analyze(sub))
      case R.Plus(sub) => return plusLike(analyze(sub))
      case R.Cls(ranges, negated) =>
        if (ranges.isEmpty) return if (negated) anyChar else noMatch
        val n = ranges.map { case (a, b) => b - a + 1 }.sum
        // negated classes and large classes: overestimate as any char
        if (negated || n > 100) return anyChar
        val chars = ranges.flatMap { case (a, b) => (a to b).map(_.toString) }
        Info(canEmpty = false, Some(StringSets.clean(chars.toVector, isSuffix = false)),
          Vector.empty, Vector.empty, TriQuery.all)
    }
    simplify(info, force = false)
  }

  private def foldedCharClass(c: Char): R.Cls = {
    val base = Vector((c, c))
    val extra =
      if (c.isLower && c < 0x80) Vector((c.toUpper, c.toUpper))
      else if (c.isUpper && c < 0x80) Vector((c.toLower, c.toLower))
      else Vector.empty
    R.Cls((base ++ extra).sortBy(_._1), negated = false)
  }

  private def plusLike(x: Info): Info =
    // x+ : at least one x, so prefixes/suffixes survive but exactness dies
    x.exact match {
      case Some(e) => x.copy(exact = None,
        prefix = e, suffix = StringSets.clean(e, isSuffix = true))
      case None => x
    }

  def concat(x: Info, y: Info): Info = {
    var matchQ = x.matchQ.and(y.matchQ)
    var exact: Option[Vector[String]] = None
    var prefix = Vector.empty[String]
    var suffix = Vector.empty[String]
    (x.exact, y.exact) match {
      case (Some(xe), Some(ye)) =>
        exact = Some(StringSets.cross(xe, ye, isSuffix = false))
      case _ =>
        x.exact match {
          case Some(xe) => prefix = StringSets.cross(xe, y.prefix, isSuffix = false)
          case None =>
            prefix = x.prefix
            if (x.canEmpty) prefix = StringSets.union(prefix, y.prefix, isSuffix = false)
        }
        y.exact match {
          case Some(ye) => suffix = StringSets.cross(x.suffix, ye, isSuffix = true)
          case None =>
            suffix = y.suffix
            if (y.canEmpty) suffix = StringSets.union(suffix, x.suffix, isSuffix = true)
        }
    }
    // when neither side is exact, the boundary region x.suffix × y.prefix
    // must contain a trigram if the strings are long enough
    if (x.exact.isEmpty && y.exact.isEmpty &&
      x.suffix.size <= MaxSet && y.prefix.size <= MaxSet &&
      StringSets.minLen(x.suffix) + StringSets.minLen(y.prefix) >= 3)
      matchQ = matchQ.andTrigrams(StringSets.cross(x.suffix, y.prefix, isSuffix = false))
    simplify(Info(x.canEmpty && y.canEmpty, exact, prefix, suffix, matchQ), force = false)
  }

  def alternate(x0: Info, y0: Info): Info = {
    var x = x0
    var y = y0
    var exact: Option[Vector[String]] = None
    var prefix = Vector.empty[String]
    var suffix = Vector.empty[String]
    (x.exact, y.exact) match {
      case (Some(xe), Some(ye)) =>
        exact = Some(StringSets.union(xe, ye, isSuffix = false))
      case (Some(xe), None) =>
        prefix = StringSets.union(xe, y.prefix, isSuffix = false)
        suffix = StringSets.union(StringSets.clean(xe, isSuffix = true), y.suffix, isSuffix = true)
        x = addExact(x)
      case (None, Some(ye)) =>
        prefix = StringSets.union(x.prefix, ye, isSuffix = false)
        suffix = StringSets.union(x.suffix, StringSets.clean(ye, isSuffix = true), isSuffix = true)
        y = addExact(y)
      case (None, None) =>
        prefix = StringSets.union(x.prefix, y.prefix, isSuffix = false)
        suffix = StringSets.union(x.suffix, y.suffix, isSuffix = true)
    }
    simplify(Info(x.canEmpty || y.canEmpty, exact, prefix, suffix,
      x.matchQ.or(y.matchQ)), force = false)
  }

  /** fold the exact set's trigrams into the match query. */
  def addExact(info: Info): Info = info.exact match {
    case Some(e) => info.copy(matchQ = info.matchQ.andTrigrams(e))
    case None => info
  }

  /** flush over-large exact sets into prefix/suffix + trigram query; cap
    * prefix/suffix sets by truncating to shared 2-byte stems. */
  def simplify(info0: Info, force: Boolean): Info = {
    var info = info0
    info.exact match {
      case Some(e0) =>
        val e = StringSets.clean(e0, isSuffix = false)
        info = info.copy(exact = Some(e))
        if (e.size > MaxExact ||
          (StringSets.minLen(e) >= 3 && force) ||
          StringSets.minLen(e) >= 4) {
          info = addExact(info)
          var prefix = info.prefix
          var suffix = info.suffix
          e.foreach { s =>
            if (s.length < 3) { prefix = prefix :+ s; suffix = suffix :+ s }
            else {
              prefix = prefix :+ s.substring(0, 2)
              suffix = suffix :+ s.substring(s.length - 2)
            }
          }
          info = info.copy(exact = None, prefix = prefix, suffix = suffix)
        }
      case None =>
    }
    if (info.exact.isEmpty) {
      val (p, q1) = simplifySet(info.prefix, info.matchQ, isSuffix = false)
      val (s, q2) = simplifySet(info.suffix, q1, isSuffix = true)
      info = info.copy(prefix = p, suffix = s, matchQ = q2)
    }
    info
  }

  /** cap a prefix/suffix set: AND its trigrams into the query, then
    * truncate members until the set is small, and drop members that are
    * extensions of other members. */
  private def simplifySet(s0: Vector[String], q0: TriQuery,
      isSuffix: Boolean): (Vector[String], TriQuery) = {
    var t = StringSets.clean(s0, isSuffix)
    val q = q0.andTrigrams(t)
    var n = 3
    while (n == 3 || t.size > MaxSet) {
      t = StringSets.clean(t.map { str =>
        if (str.length >= n) {
          if (!isSuffix) str.substring(0, n - 1)
          else str.substring(str.length - n + 1)
        } else str
      }, isSuffix)
      n -= 1
    }
    // drop redundant extensions: knowing "ab" is a possible prefix makes
    // "abc" useless
    val out = t.foldLeft(Vector.empty[String]) { (acc, str) =>
      val redundant = acc.lastOption.exists { prev =>
        if (!isSuffix) str.startsWith(prev) else str.endsWith(prev)
      }
      if (redundant) acc else acc :+ str
    }
    (out, q)
  }
}
