package graft.queries

/** Minimal regexp AST + parser for the trigram compiler. Supports the
  * practical subset: literals, '.', char classes (ranges, negation,
  * \d\w\s escapes), alternation, groups (capturing / (?:..) / (?i) flag),
  * quantifiers * + ? {m} {m,} {m,n}, anchors ^ $ \b \B \A \z, escapes.
  * Literal runs are coalesced into one [[Regex.Lit]] node (like Go's
  * regexp/syntax) — the analyzer's exact-set math depends on it.
  */
object Regex {
  sealed trait Node
  case object Empty extends Node
  case object NoMatch extends Node
  case object AnyChar extends Node
  /** ^ $ \b \B \A \z — zero-width assertion; `kind` is the anchor char
    * ('^' '$' 'b' 'B' 'A' 'z') so [[Matcher]] can evaluate it (the
    * trigram compiler only needs zero-width-ness). */
  final case class Anchor(kind: Char) extends Node
  final case class Lit(s: String, foldCase: Boolean) extends Node
  final case class Cls(ranges: Vector[(Char, Char)], negated: Boolean) extends Node
  final case class Cat(subs: Vector[Node]) extends Node
  final case class Alt(subs: Vector[Node]) extends Node
  final case class Star(sub: Node) extends Node
  final case class Plus(sub: Node) extends Node
  final case class Quest(sub: Node) extends Node
  final case class Rep(sub: Node, min: Int, max: Int) extends Node // max = -1: unbounded

  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(pattern: String): Node = new Parser(pattern).parseTop()

  /** Parse plus the (?s) dotAll flag — [[Matcher]] needs it to decide
    * whether '.' crosses line terminators. */
  def parseWithFlags(pattern: String): (Node, Boolean) = {
    val p = new Parser(pattern)
    val n = p.parseTop()
    (n, p.dotAllFlag)
  }

  private final class Parser(s: String) {
    private var pos = 0
    private var foldCase = false
    private[Regex] var dotAllFlag = false
    // inline (?i)/(?s) are accepted ONLY as a prefix of the whole
    // pattern: mid-pattern flags have positional/group-scoped semantics
    // in java.util.regex ((?s) is not retroactive; (?i) inside a group
    // ends at the group), which a single global flag cannot express —
    // applying them globally silently changed the match set
    // (code-review r05). Out-of-prefix flags ParseError -> the
    // java.util.regex fallback serves them with exact semantics.
    private var flagPrefixEnd = 0
    // a quantifier may not follow a bare quantifier: `a+?`/`a{2,3}?`
    // (lazy), `a*+` (possessive) and `a**` all have different semantics
    // in java.util.regex than the stacked-quantifier reading
    // (Quest(Plus(a)) matches "", lazy a+? does not) — ParseError ->
    // fallback. `(a*)+` stays legal: the group resets the flag.
    private var lastWasQuant = false

    def parseTop(): Node = {
      val n = parseAlt()
      if (pos < s.length) throw ParseError(s"unexpected '${s.charAt(pos)}' at $pos")
      n
    }

    private def parseAlt(): Node = {
      val subs = scala.collection.mutable.ArrayBuffer(parseCat())
      while (pos < s.length && s.charAt(pos) == '|') {
        pos += 1
        subs += parseCat()
      }
      if (subs.size == 1) subs.head else Alt(subs.toVector)
    }

    private def parseCat(): Node = {
      val subs = scala.collection.mutable.ArrayBuffer.empty[Node]
      val lit = new StringBuilder
      def flushLit(): Unit = if (lit.nonEmpty) {
        subs += Lit(lit.toString, foldCase); lit.clear()
      }
      def flushLastForRepeat(): Node = {
        // a repeat binds to the last single char of a literal run
        if (lit.nonEmpty) {
          val last = lit.charAt(lit.length - 1)
          lit.setLength(lit.length - 1)
          flushLit()
          Lit(last.toString, foldCase)
        } else if (subs.nonEmpty) {
          val last = subs.remove(subs.size - 1)
          last
        } else throw ParseError(s"quantifier with nothing to repeat at $pos")
      }
      while (pos < s.length && s.charAt(pos) != '|' && s.charAt(pos) != ')') {
        val wasQuant = lastWasQuant
        lastWasQuant = false
        def quant(): Unit = {
          if (wasQuant)
            throw ParseError(s"quantifier after quantifier at $pos " +
              "(lazy/possessive forms are outside the subset)")
          lastWasQuant = true
        }
        s.charAt(pos) match {
          case '(' =>
            flushLit()
            subs += parseGroup()
            // the recursive parseCat inside the group may have left the
            // flag set by its own trailing quantifier; a quantifier after
            // ')' binds the whole group ((a*)+ is legal)
            lastWasQuant = false
          case '[' =>
            flushLit()
            subs += parseClass()
            lastWasQuant = false
          case '.' => flushLit(); subs += AnyChar; pos += 1
          case a @ ('^' | '$') => flushLit(); subs += Anchor(a); pos += 1
          case '*' => quant(); val a = flushLastForRepeat(); subs += Star(a); pos += 1
          case '+' => quant(); val a = flushLastForRepeat(); subs += Plus(a); pos += 1
          case '?' => quant(); val a = flushLastForRepeat(); subs += Quest(a); pos += 1
          case '{' =>
            val close = s.indexOf('}', pos)
            if (close < 0)
              // java.util.regex: "Unclosed counted closure" — literalizing
              // '{' here would serve a pattern the oracle engine rejects
              // (code-review r05)
              throw ParseError(s"unclosed {{ at $pos")
            else {
              val body = s.substring(pos + 1, close)
              val m = "^(\\d+)(,(\\d*))?$".r.findFirstMatchIn(body)
              m match {
                case Some(g) =>
                  quant()
                  val a = flushLastForRepeat()
                  // RE2-style cap: huge bounds would overflow Int (raw
                  // NumberFormatException escaping every ParseError
                  // handler) or expand the NFA unboundedly — reject, so
                  // tryCompile declines and the step-bounded
                  // java.util.regex fallback serves the pattern
                  // (code-review r04)
                  def bound(d: String): Int =
                    if (d.length > 4 || d.toInt > 1000)
                      throw ParseError(s"repetition bound $d too large")
                    else d.toInt
                  val min = bound(g.group(1))
                  val max =
                    if (g.group(2) == null) min
                    else if (g.group(3).isEmpty) -1
                    else bound(g.group(3))
                  // java.util.regex rejects inverted ranges; silently
                  // serving {m} for {5,2} would diverge (code-review r04)
                  if (max >= 0 && max < min)
                    throw ParseError(s"bad repetition range {$min,$max}")
                  subs += Rep(a, min, max)
                  pos = close + 1
                case None =>
                  // java.util.regex: "Illegal repetition" for a{b}, a{,5},
                  // a{} — same refusal here (code-review r05)
                  throw ParseError(s"malformed repetition {{$body}}")
              }
            }
          case '\\' =>
            pos += 1
            if (pos >= s.length) throw ParseError("trailing backslash")
            s.charAt(pos) match {
              case a @ ('b' | 'B' | 'A' | 'z') => flushLit(); subs += Anchor(a); pos += 1
              case 'd' => flushLit(); subs += Cls(Vector(('0', '9')), negated = false); pos += 1
              case 'D' => flushLit(); subs += Cls(Vector(('0', '9')), negated = true); pos += 1
              case 'w' => flushLit(); subs += wordCls; pos += 1
              case 'W' => flushLit(); subs += wordCls.copy(negated = true); pos += 1
              case 's' => flushLit(); subs += spaceCls; pos += 1
              case 'S' => flushLit(); subs += spaceCls.copy(negated = true); pos += 1
              case 'n' => lit.append('\n'); pos += 1
              case 't' => lit.append('\t'); pos += 1
              case 'r' => lit.append('\r'); pos += 1
              case 'a' => lit.append('\u0007'); pos += 1
              case 'f' => lit.append('\f'); pos += 1
              case 'e' => lit.append('\u001b'); pos += 1
              case 'x' => lit.append(hexEscape()); pos += 1
              case c if c.isLetterOrDigit =>
                // \1-\9 are BACKREFERENCES; \Z \G \p{..} \uHHHH \Q..\E \v
                // are java.util.regex constructs outside this subset --
                // treating them as literal chars would silently change the
                // match set (a `(a)\1` candidate query would miss 'aa'
                // docs). Reject instead: Matcher.tryCompile fails and
                // RegexVerifier falls back to the step-bounded
                // java.util.regex engine; the trigram compiler falls back
                // to the guarded full scan (code-review r04).
                throw ParseError(s"unsupported escape \\$c")
              case c => lit.append(c); pos += 1
            }
          case c => lit.append(c); pos += 1
        }
      }
      flushLit()
      if (subs.isEmpty) Empty
      else if (subs.size == 1) subs.head
      else Cat(subs.toVector)
    }

    private val wordCls = Cls(Vector(('0', '9'), ('A', 'Z'), ('_', '_'), ('a', 'z')), negated = false)
    // \t..\r == 0x09-0x0D: java.util.regex \s is [ \t\n\x0B\f\r] — the
    // vertical tab IS included (an earlier \t\n + \f\r split dropped it)
    private val spaceCls = Cls(Vector(('\t', '\r'), (' ', ' ')), negated = false)

    /** Exact interval complement over the full char range; input ranges
      * must be sorted and disjoint (the meta-class constants are). */
    private def complementRanges(rs: Seq[(Char, Char)]): Vector[(Char, Char)] = {
      val out = Vector.newBuilder[(Char, Char)]
      var next = Char.MinValue
      var open = true // still room left at/after `next`
      rs.foreach { case (lo, hi) =>
        if (open) {
          if (lo > next) out += ((next, (lo - 1).toChar))
          if (hi == Char.MaxValue) open = false
          else next = (hi + 1).toChar
        }
      }
      if (open) out += ((next, Char.MaxValue))
      out.result()
    }

    /** \xHH — pos points at 'x' on entry and at the last hex digit on
      * exit (the caller advances past it). */
    private def hexEscape(): Char = {
      if (pos + 2 >= s.length) throw ParseError("truncated \\x escape")
      val h = s.substring(pos + 1, pos + 3)
      // strict ASCII hex only: Integer.parseInt would also accept '+'/'-'
      // signs and Unicode digits, silently compiling escapes that
      // java.util.regex rejects (`\x-1` -> '￿' — code-review r04)
      def hex(c: Char): Boolean =
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      if (!hex(h.charAt(0)) || !hex(h.charAt(1))) throw ParseError(s"bad \\x$h")
      pos += 2
      Integer.parseInt(h, 16).toChar
    }

    private def parseGroup(): Node = {
      val start = pos
      pos += 1 // consume '('
      if (s.startsWith("?:", pos)) pos += 2
      else if (s.startsWith("?i)", pos) || s.startsWith("?s)", pos)) {
        if (start != flagPrefixEnd)
          throw ParseError(s"inline flag at $start is not a pattern prefix " +
            "(mid-pattern flags are outside the subset)")
        if (s.charAt(pos + 1) == 'i') foldCase = true else dotAllFlag = true
        pos += 3; flagPrefixEnd = pos
        return Empty
      }
      val n = parseAlt()
      if (pos >= s.length || s.charAt(pos) != ')') throw ParseError("missing )")
      pos += 1
      n
    }

    private def parseClass(): Node = {
      pos += 1 // consume '['
      var negated = false
      if (pos < s.length && s.charAt(pos) == '^') { negated = true; pos += 1 }
      val ranges = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
      // a ']' in FIRST position (after any '^') is a literal member —
      // java.util.regex accepts `[]a]`/`[^]a]` exactly like POSIX
      // (verified on this JVM; a code-review claim that Java rejects
      // them was wrong)
      var first = true
      while (pos < s.length && (s.charAt(pos) != ']' || first)) {
        first = false
        classAtom(ranges) match {
          case None => () // meta class (\d \w \s ...): ranges appended directly
          case Some(lo) =>
            if (pos + 1 < s.length && s.charAt(pos) == '-' && s.charAt(pos + 1) != ']') {
              pos += 1 // consume '-'
              classAtom(ranges) match {
                case Some(hi) =>
                  if (hi < lo) throw ParseError(s"bad class range $lo-$hi")
                  ranges += ((lo, hi))
                case None => throw ParseError("meta class cannot bound a range")
              }
            } else ranges += ((lo, lo))
        }
      }
      if (pos >= s.length) throw ParseError("missing ]")
      pos += 1 // consume ']'
      // `[]` / `[^]` are errors in java.util.regex (leading ']' must be
      // escaped) — reject, so both engines refuse the pattern identically
      if (ranges.isEmpty) throw ParseError("empty character class")
      val folded =
        if (foldCase)
          ranges.toVector.flatMap { case (a, b) =>
            Vector((a, b)) ++ foldRange(a, b)
          }
        else ranges.toVector
      // [^\s\S]: negated class whose ranges cover everything -> no match.
      // Detect on the NORMALIZED ranges: \S etc. contribute multi-piece
      // complements that only merge to (MinValue,MaxValue) after
      // adjacency coalescing (2nd-pass code-review r04)
      val norm = normalize(folded)
      if (negated && coversAll(norm)) NoMatch
      else Cls(norm, negated)
    }

    /** One class atom. Some(c): a single character (escapes resolved —
      * may serve as a range bound, so `[\x41-\x5a]` parses as A-Z).
      * None: a meta class (\d \w \s ...) whose ranges were appended to
      * `buf` directly (cannot bound a range). A Boolean flag, not a
      * lo==0 sentinel, so `[\x00]` keeps NUL (code-review r04). */
    private def classAtom(
        buf: scala.collection.mutable.ArrayBuffer[(Char, Char)]): Option[Char] = {
      val c0 = s.charAt(pos)
      if (c0 != '\\' || pos + 1 >= s.length) { pos += 1; Some(c0) }
      else {
        pos += 1
        s.charAt(pos) match {
          case 'd' => pos += 1; buf += (('0', '9')); None
          case 'w' => pos += 1; buf ++= wordCls.ranges; None
          case 's' => pos += 1; buf ++= spaceCls.ranges; None
          case 'D' => pos += 1; buf ++= complementRanges(Vector(('0', '9'))); None
          case 'W' => pos += 1; buf ++= complementRanges(wordCls.ranges); None
          case 'S' =>
            // negated metas in a class are EXACT interval complements —
            // the old "everything" approximation made 'x[\D]' match "x5"
            // and compiled '[^\W]' to match-nothing, silent divergences
            // from java.util.regex (2nd-pass code-review r04)
            pos += 1; buf ++= complementRanges(spaceCls.ranges); None
          case 'n' => pos += 1; Some('\n')
          case 't' => pos += 1; Some('\t')
          case 'r' => pos += 1; Some('\r')
          case 'a' => pos += 1; Some('\u0007')
          case 'f' => pos += 1; Some('\f')
          case 'e' => pos += 1; Some('\u001b')
          // NOTE deliberately NO `case 'b'`: Perl/JS read [\b] as
          // backspace, but java.util.regex REJECTS it ("Illegal/
          // unsupported escape sequence", verified on this JVM) -- it
          // falls through to the strict-reject arm so both engines
          // refuse the pattern identically
          case 'x' => val h = hexEscape(); pos += 1; Some(h)
          case c if c.isLetterOrDigit =>
            throw ParseError(s"unsupported escape \\$c in class")
          case c => pos += 1; Some(c)
        }
      }
    }

    private def foldRange(a: Char, b: Char): Vector[(Char, Char)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
      var c = a
      while (c <= b && c < 0x80) {
        if (c.isLower) out += ((c.toUpper, c.toUpper))
        if (c.isUpper) out += ((c.toLower, c.toLower))
        c = (c + 1).toChar
      }
      out.toVector
    }

    private def coversAll(rs: Vector[(Char, Char)]): Boolean =
      rs.exists { case (a, b) => a == Char.MinValue && b == Char.MaxValue }

    private def normalize(rs: Vector[(Char, Char)]): Vector[(Char, Char)] =
      rs.sortBy(_._1).foldLeft(Vector.empty[(Char, Char)]) { (acc, r) =>
        acc.lastOption match {
          // Int arithmetic: (b + 1).toChar wraps to 0 at Char.MaxValue,
          // which left overlapping ranges unmerged (e.g. [\Sa] kept a
          // redundant (a,a) inside (!,￿) — 3rd-pass code-review r04)
          case Some((a, b)) if r._1.toInt <= b.toInt + 1 =>
            acc.init :+ ((a, if (r._2 > b) r._2 else b))
          case _ => acc :+ r
        }
      }
  }
}
