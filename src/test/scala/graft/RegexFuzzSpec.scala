package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Matcher

/** Differential fuzz of the linear-time verification engine: thousands of
  * random patterns drawn from the supported grammar, each checked against
  * `java.util.regex` on random inputs. The Pike VM must agree with the
  * backtracking engine on every (pattern, input) pair — same contract the
  * reference pins for its DFA vs Go's regexp (`regexp/match_test.go`).
  * Deterministic seed so a failure reproduces.
  */
class RegexFuzzSpec extends AnyFunSuite {

  import graft.queries.Regex

  private def canMatchEmpty(n: Regex.Node): Boolean = n match {
    case Regex.Empty | Regex.Anchor(_) => true
    case Regex.Lit(s, _) => s.isEmpty
    case Regex.Cat(subs) => subs.forall(canMatchEmpty)
    case Regex.Alt(subs) => subs.exists(canMatchEmpty)
    case Regex.Star(_) | Regex.Quest(_) => true
    case Regex.Plus(sub) => canMatchEmpty(sub)
    case Regex.Rep(sub, min, _) => min == 0 || canMatchEmpty(sub)
    case _ => false
  }

  /** True when some quantifier's body can match the empty string — the
    * one corner where `java.util.regex` is NOT a valid oracle: Java
    * breaks quantifier loops on zero-length iterations (so `(\b){2}x`
    * can fail where the NFA answer is a match), while the Pike VM keeps
    * true Thompson/RE2 semantics — the same answer as the reference's
    * DFA and as DuckDB's RE2 in the driver oracle. */
  private def hasEmptyQuantifiedBody(n: Regex.Node): Boolean = n match {
    case Regex.Star(sub) => canMatchEmpty(sub) || hasEmptyQuantifiedBody(sub)
    case Regex.Plus(sub) => canMatchEmpty(sub) || hasEmptyQuantifiedBody(sub)
    case Regex.Quest(sub) => canMatchEmpty(sub) || hasEmptyQuantifiedBody(sub)
    case Regex.Rep(sub, _, _) => canMatchEmpty(sub) || hasEmptyQuantifiedBody(sub)
    case Regex.Cat(subs) => subs.exists(hasEmptyQuantifiedBody)
    case Regex.Alt(subs) => subs.exists(hasEmptyQuantifiedBody)
    case _ => false
  }

  private def randPattern(r: scala.util.Random, depth: Int): String = {
    def atom(): String = r.nextInt(12) match {
      case 0 | 1 | 2 | 3 => ("abc" (r.nextInt(3))).toString
      case 4 => "."
      case 5 => // small class, maybe negated, maybe a range
        val neg = if (r.nextBoolean()) "^" else ""
        val body = r.nextInt(7) match {
          case 0 => "ab"
          case 1 => "a-c"
          case 2 => "b-cx"
          case 3 => "\\x61-\\x63" // a-c via escaped hex bounds (r04)
          case 4 => "\\dx" // meta class inside a class (r04)
          case 5 => "\\D" // negated meta: exact interval complement (r04)
          case 6 => "a\\S"
        }
        s"[$neg$body]"
      case 6 if depth > 0 => "(" + randPattern(r, depth - 1) + ")"
      case 7 if depth > 0 =>
        "(" + randPattern(r, depth - 1) + "|" + randPattern(r, depth - 1) + ")"
      case 8 => Seq("\\d", "\\w", "\\s", "\\W", "\\S")(r.nextInt(5))
      case _ => ("abcx" (r.nextInt(4))).toString
    }
    val n = 1 + r.nextInt(4)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      var a = atom()
      r.nextInt(6) match {
        case 0 => a += "*"
        case 1 => a += "+"
        case 2 => a += "?"
        case 3 => a += s"{${r.nextInt(3)},${r.nextInt(3) + 2}}"
        case _ => ()
      }
      sb ++= a
    }
    // occasional anchors / word boundaries at the edges
    val pre = r.nextInt(8) match {
      case 0 => "^"
      case 1 => "\\b"
      case _ => ""
    }
    val post = r.nextInt(8) match {
      case 0 => "$"
      case 1 => "\\b"
      case _ => ""
    }
    pre + sb.result() + post
  }

  /** Step-bounded java.util.regex find — the ORACLE side needs the bound:
    * random nested quantifiers are backtracking bombs for Java (the exact
    * weakness the Pike VM exists to remove), so an unbounded oracle hangs
    * the suite. None = oracle exceeded its budget, skip the comparison. */
  private def javaFind(p: java.util.regex.Pattern, s: String): Option[Boolean] = {
    object Exceeded extends RuntimeException
    var steps = 0L
    val counted: CharSequence = new CharSequence {
      def length: Int = s.length
      def charAt(i: Int): Char = {
        steps += 1
        if (steps > 2000000L) throw Exceeded
        s.charAt(i)
      }
      def subSequence(a: Int, b: Int): CharSequence = s.subSequence(a, b)
      override def toString: String = s
    }
    try Some(p.matcher(counted).find())
    catch { case Exceeded => None }
  }

  private def randInput(r: scala.util.Random): String = {
    // beyond letters: digits/uppercase (exercise \d \w folds), CR + NEL
    // (the '$'-before-terminator and '.'-excludes-terminator cases, r04),
    // and vertical tab (inside java's \s — a one-char class-range slip
    // this fuzz caught)
    val alphabet = "aabbccx \naB7\r" + 0x85.toChar + 0x0b.toChar
    val n = r.nextInt(40)
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb += alphabet(r.nextInt(alphabet.length)))
    sb.result()
  }

  test("Pike VM agrees with java.util.regex on random patterns/inputs") {
    val r = new scala.util.Random(20260817L)
    var patterns = 0
    var comparisons = 0
    var skippedEmptyLoop = 0
    // one-off deep runs: GRAFT_FUZZ_PATTERNS=20000 sbt "testOnly *RegexFuzzSpec"
    val target = sys.env.getOrElse("GRAFT_FUZZ_PATTERNS", "1500").toInt
    while (patterns < target) {
      val p = randPattern(r, depth = 2)
      val emptyLoop =
        try hasEmptyQuantifiedBody(Regex.parseWithFlags(p)._1)
        catch { case _: Regex.ParseError => true }
      if (emptyLoop) skippedEmptyLoop += 1
      else Matcher.tryCompile(p).foreach { m =>
        patterns += 1
        val jre = java.util.regex.Pattern.compile(p)
        (0 until 40).foreach { _ =>
          val s = randInput(r)
          val got = m.find(s)
          javaFind(jre, s).foreach { want =>
            comparisons += 1
            assert(got == want,
              s"pattern '$p' on input '${s.replace("\n", "\\n")}': " +
                s"pike=$got jur=$want")
          }
        }
      }
    }
    info(s"$patterns patterns, $comparisons comparisons, all agree " +
      s"($skippedEmptyLoop empty-loop patterns excluded from the Java oracle)")
  }

  test("empty-quantified-body divergence: Pike VM keeps NFA/RE2 semantics") {
    // `(\b[^b-cx]*){2,4}` on "a \n": iteration 1 may match empty at pos 1
    // and iteration 2 consume the space — a valid NFA decomposition, so
    // the match EXISTS. java.util.regex stops quantifier loops on
    // zero-length iterations and answers false; RE2 (the reference's
    // engine and DuckDB's, i.e. the driver oracle) answers true. The
    // Pike VM sides with RE2 — pin that.
    val p = "a(\\b[^b-cx]*){2,4}$"
    val s = "a \n"
    assert(Matcher.compile(p).find(s))
    assert(!java.util.regex.Pattern.compile(p).matcher(s).find())
  }

  test("case-insensitive fold agrees with java.util.regex on ASCII") {
    val r = new scala.util.Random(42L)
    var patterns = 0
    while (patterns < 300) {
      val p = "(?i)" + randPattern(r, depth = 1)
      val emptyLoop =
        try hasEmptyQuantifiedBody(Regex.parseWithFlags(p)._1)
        catch { case _: Regex.ParseError => true }
      if (!emptyLoop) Matcher.tryCompile(p).foreach { m =>
        patterns += 1
        val jre = java.util.regex.Pattern.compile(p)
        (0 until 20).foreach { _ =>
          val s0 = randInput(r)
          // mix case so the fold actually matters
          val s = s0.map(c => if (r.nextBoolean()) c.toUpper else c)
          javaFind(jre, s).foreach { want =>
            assert(m.find(s) == want,
              s"(?i) pattern '$p' on '${s.replace("\n", "\\n")}'")
          }
        }
      }
    }
    info(s"$patterns case-insensitive patterns agree")
  }
}
