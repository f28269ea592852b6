package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.index.Search

/** Port of the reference regexp matcher's grep semantics tests
  * (`/root/reference/regexp/regexp_test.go` matchTests + grepTests): for
  * each (pattern, input), the 1-based line numbers whose line contains a
  * match. Our X2 analogue evaluates the pattern per line with Java regex
  * `find` — exactly what `Search.grepContext`'s per-line `rlike` does —
  * so the goldens pin the verification-stage semantics.
  *
  * Two adaptations from Go RE2, marked below:
  *  - Java needs the `u` flag for case-insensitive folding of non-ASCII
  *    (`(?im)^[α]+$` → `(?imu)...`);
  *  - Go-only syntax in the original table is untouched otherwise.
  */
class GrepMatchSpec extends AnyFunSuite {

  /** the per-line match semantics of the grep stage (rlike == find). */
  private def grepLines(pattern: String, s: String): Seq[Int] = {
    val p = java.util.regex.Pattern.compile(pattern)
    s.split("\n").toSeq.zipWithIndex.collect {
      case (line, i) if p.matcher(line).find() => i + 1
    }
  }

  // (pattern, input, matching line numbers — Nil for no match)
  val cases: Seq[(String, String, Seq[Int])] = Seq(
    ("a+", "abc\ndef\nghi\n", Seq(1)),
    ("", "", Seq(1)),
    ("^abcdefg", "abcdefg", Seq(1)),
    ("a+", "baaab", Seq(1)),
    ("abcd..", "abcdef", Seq(1)),
    ("a", "a", Seq(1)),
    ("x", "y", Nil),
    ("b", "abc", Seq(1)),
    (".", "a", Seq(1)),
    (".*", "abcdef", Seq(1)),
    ("^", "abcde", Seq(1)),
    ("$", "abcde", Seq(1)),
    ("^abcd$", "abcd", Seq(1)),
    ("^bcd'", "abcdef", Nil),
    ("^abcd$", "abcde", Nil),
    ("a*", "baaab", Seq(1)),
    ("[a-z]+", "abcd", Seq(1)),
    ("[^a-z]+", "ab1234cd", Seq(1)),
    ("[a\\-\\]z]+", "az]-bcz", Seq(1)),
    ("[^\\n]+", "abcd\n", Seq(1)),
    ("[日本語]+", "日本語日本語", Seq(1)),
    ("日本語+", "日本語", Seq(1)),
    ("日本語+", "日本語語語語", Seq(1)),
    ("()", "", Seq(1)),
    ("(a)", "a", Seq(1)),
    ("(.)(.)", "日a", Seq(1)),
    ("(.*)", "", Seq(1)),
    ("(.*)", "abcd", Seq(1)),
    ("(..)(..)", "abcd", Seq(1)),
    ("(([^xyz]*)(d))", "abcd", Seq(1)),
    ("((a|b|c)*(d))", "abcd", Seq(1)),
    ("(((a|b|c)*)(d))", "abcd", Seq(1)),
    ("\\a\\f\\r\\t\\x0B", "\f\r\t", Seq(1)),
    ("[\\a\\f\\n\\r\\t\\x0B]+", "\f\r\t", Seq(1)),
    ("a*(|(b))c*", "aacc", Seq(1)),
    ("(.*).*", "ab", Seq(1)),
    ("[.]", ".", Seq(1)),
    ("/$", "/abc/", Seq(1)),
    ("/$", "/abc", Nil),
    // multiple matches within a line count once
    (".", "abc", Seq(1)),
    ("(.)", "abc", Seq(1)),
    (".(.)", "abcd", Seq(1)),
    ("ab*", "abbaab", Seq(1)),
    ("a(b*)", "abbaab", Seq(1)),
    // fixed bugs from the reference table
    ("ab$", "cab", Seq(1)),
    ("axxb$", "axxcb", Nil),
    ("data", "daXY data", Seq(1)),
    ("da(.)a$", "daXY data", Seq(1)),
    ("zx+", "zzx", Seq(1)),
    ("ab$", "abcab", Seq(1)),
    ("(aa)*$", "a", Seq(1)),
    ("(?:.|(?:.a))", "", Nil),
    ("(?:A(?:A|a))", "Aa", Seq(1)),
    ("(?:A|(?:A|a))", "a", Seq(1)),
    ("(a){0}", "", Seq(1)),
    ("\\b", "x", Seq(1)),
    ("\\b", "xx", Seq(1)),
    ("\\b", "x y", Seq(1)),
    ("\\b", "xx yy", Seq(1)),
    ("\\B", "x", Nil),
    ("\\B", "xx", Seq(1)),
    ("\\B", "x y", Nil),
    ("\\B", "xx yy", Seq(1)),
    ("(?im)^[abc]+$", "abcABC", Seq(1)),
    ("(?imu)^[α]+$", "αΑ", Seq(1)), // Java: u flag for non-ASCII folding
    ("[Aa]BC", "abc", Nil),
    ("[Aa]bc", "abc", Seq(1)),
    // RE2 class-algebra tests
    ("[^\\S\\s]", "abcd", Nil),
    ("[^\\S\\p{Space}]", "abcd", Nil), // Go [:space:] → Java \p{Space}
    ("[^\\D\\d]", "abcd", Nil),
    ("[^\\D\\p{Digit}]", "abcd", Nil), // Go [:digit:] → Java \p{Digit}
    ("(?i)\\W", "x", Nil),
    ("(?i)\\W", "k", Nil),
    ("(?i)\\W", "s", Nil),
    // backslash-escaped punctuation
    ("\\!\\\"\\#\\$\\%\\&\\'\\(\\)\\*\\+\\,\\-\\.\\/\\:\\;\\<\\=\\>\\?\\@\\[\\\\\\]\\^\\_\\{\\|\\}\\~",
      "!\"#$%&'()*+,-./:;<=>?@[\\]^_{|}~", Seq(1)),
    ("[\\!\\\"\\#\\$\\%\\&\\'\\(\\)\\*\\+\\,\\-\\.\\/\\:\\;\\<\\=\\>\\?\\@\\[\\\\\\]\\^\\_\\{\\|\\}\\~]+",
      "!\"#$%&'()*+,-./:;<=>?@[\\]^_{|}~", Seq(1)),
    ("\\`", "`", Seq(1)),
    ("[\\`]+", "`", Seq(1)),
    (".", "qwertyuiopasdfghjklzxcvbnm1234567890", Seq(1)),
    // multi-line: which lines match
    ("a+", "abc\ndef\nghalloo\n", Seq(1, 3)),
    ("x.*y", "xay\nxa\ny\n", Seq(1)))

  test("reference matchTests: line-match goldens") {
    val failures = cases.zipWithIndex.flatMap { case ((re, s, want), i) =>
      val got =
        try grepLines(re, s)
        catch { case e: Exception => Seq(-999) }
      if (got == want) None
      else Some(s"  case#$i /$re/ on ${s.replace("\n", "\\n")}: got=$got want=$want")
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  /** the goldens again through the ENGINE's verifier (linear-time NFA,
    * step-bounded fallback for exotic syntax) — the verification stage
    * must agree with java.util.regex `find` on every reference case. */
  private def grepLinesVerifier(pattern: String, s: String): Seq[Int] = {
    val v = new graft.queries.RegexVerifier(pattern)
    s.split("\n").toSeq.zipWithIndex.collect {
      case (line, i) if v.find(line) => i + 1
    }
  }

  test("RegexVerifier matches every golden (NFA + fallback paths)") {
    val failures = cases.zipWithIndex.flatMap { case ((re, s, want), i) =>
      val got =
        try grepLinesVerifier(re, s)
        catch { case e: Exception => Seq(-999) }
      val linear = graft.queries.Matcher.tryCompile(re).nonEmpty
      if (got == want) None
      else Some(s"  case#$i /$re/ (linear=$linear) on " +
        s"${s.replace("\n", "\\n")}: got=$got want=$want")
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
    // the practical subset really takes the linear path, not the fallback
    val linearCount = cases.count(c => graft.queries.Matcher.tryCompile(c._1).nonEmpty)
    assert(linearCount >= cases.length - 6,
      s"only $linearCount/${cases.length} goldens compile to the NFA")
  }

  test("pathological backtracking patterns complete in bounded time") {
    // (a+)+$ on a long non-matching input: exponential for a backtracker,
    // linear for the NFA — the dcs DFA robustness property (match.go:21)
    val evil = "(a+)+$"
    assert(graft.queries.Matcher.tryCompile(evil).nonEmpty, "evil pattern must take the NFA path")
    val v = new graft.queries.RegexVerifier(evil)
    val input = "a" * 20000 + "b"
    val t0 = System.nanoTime()
    assert(!v.find(input))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"linear-time match took ${ms}ms")
    // nested quantifier variant
    val v2 = new graft.queries.RegexVerifier("(a*)*c")
    assert(!v2.find("a" * 20000 + "b"))
    assert(v2.find("a" * 100 + "c"))
    // the non-linear FALLBACK path is step-bounded: same bomb forced
    // through java.util.regex (via an unsupported flag) aborts cleanly
    val fb = new graft.queries.RegexVerifier("(?m)(a+)+$")
    assert(!fb.isLinear)
    intercept[IllegalStateException] { fb.find("a" * 2000 + "b") }
  }

  test("'$' agrees with java.util.regex on every line-terminator flavor") {
    // default-mode '$' matches before ONE final terminator: \n, \r\n, \r,
    // NEL, LS, PS — and nowhere else (r04: the old check was \n-only and
    // silently missed CRLF corpora)
    val m = graft.queries.Matcher.tryCompile("foo$").get
    val p = java.util.regex.Pattern.compile("foo$")
    val inputs = Seq("foo", "foo\n", "foo\r\n", "foo\r",
      "foo" + 0x85.toChar, "foo" + 0x2028.toChar, "foo" + 0x2029.toChar,
      "foo\n\n", "foo\r\nx", "foo\rx", "foo\n\r", "foo\n" + 0x85.toChar)
    for (in <- inputs) {
      val want = p.matcher(in).find()
      assert(m.find(in) == want,
        s"input=${in.map(c => f"<u+${c.toInt}%04x>").mkString} want=$want")
    }
    // '$' must NOT match BETWEEN the \r and \n of a final CRLF — Java
    // refuses that position (second-pass code-review r04)
    val m2 = graft.queries.Matcher.tryCompile("a\\r$").get
    val p2 = java.util.regex.Pattern.compile("a\\r$")
    for (in <- Seq("a\r\n", "a\r", "a\r\nx", "a\r" + 0x85.toChar))
      assert(m2.find(in) == p2.matcher(in).find(),
        s"a\\r$$ on ${in.map(c => f"<u+${c.toInt}%04x>").mkString}")
  }

  test("repetition bounds: overflow, RE2-style cap, inverted range") {
    import graft.queries.{Matcher, RegexVerifier}
    // a bound that overflows Int must raise ParseError, not a raw
    // NumberFormatException escaping every handler (code-review r04);
    // java.util.regex also rejects it, so the verifier errors cleanly
    assert(Matcher.tryCompile("a{99999999999}").isEmpty)
    intercept[java.util.regex.PatternSyntaxException](
      new RegexVerifier("a{99999999999}"))
    // inverted range: Java rejects {5,2}; silently serving {5} diverges
    assert(Matcher.tryCompile("a{5,2}").isEmpty)
    intercept[java.util.regex.PatternSyntaxException](
      new RegexVerifier("a{5,2}"))
    // above the RE2-style 1000 cap the NFA declines but the step-bounded
    // fallback still serves the pattern (Java accepts it)
    assert(Matcher.tryCompile("a{1001}").isEmpty)
    val v = new RegexVerifier("a{1001}")
    assert(!v.isLinear && v.find("a" * 1001) && !v.find("a" * 1000))
    // at the cap the linear path still takes it
    assert(Matcher.tryCompile("a{3,1000}").nonEmpty)
  }

  test("lazy/possessive quantifiers and mid-pattern flags leave the subset (r05)") {
    import graft.queries.{Matcher, RegexVerifier}
    // stacked-quantifier reading of a+? (Quest(Plus)) matches "" where
    // Java's LAZY a+? does not — the subset must decline, the fallback
    // serves Java's semantics
    for (pat <- Seq("a+?", "a*?", "a??", "a{2,3}?", "a*+", "a++", "a**"))
      assert(Matcher.tryCompile(pat).isEmpty, s"/$pat/ must not take the NFA path")
    val lazyPlus = new RegexVerifier(".+?")
    assert(!lazyPlus.isLinear && !lazyPlus.find("") && lazyPlus.find("x"))
    intercept[java.util.regex.PatternSyntaxException](new RegexVerifier("a**"))
    // a quantified GROUP is not a stacked quantifier
    assert(Matcher.tryCompile("(a*)+").nonEmpty)
    assert(Matcher.tryCompile("[ab]*+c").isEmpty) // possessive after class
    assert(Matcher.tryCompile("([ab]*)+c").nonEmpty)
    // mid-pattern inline flags have positional/scoped semantics a global
    // flag cannot express: (?s) is not retroactive, (?i) ends at its
    // group — subset takes them only as a whole-pattern prefix
    for (pat <- Seq("a.b(?s)", "(x(?i)y)z", "a(?s).b"))
      assert(Matcher.tryCompile(pat).isEmpty, s"/$pat/ must not take the NFA path")
    val retro = new RegexVerifier("a.b(?s)")
    assert(!retro.isLinear && !retro.find("a\nb")) // Java: flag NOT retroactive
    val scoped = new RegexVerifier("(x(?i)y)z")
    assert(!scoped.isLinear && scoped.find("xYz") && !scoped.find("xYZ"))
    // prefix flags stay on the linear path
    assert(Matcher.tryCompile("(?i)(?s)a.b").nonEmpty)
    // malformed brace bodies: Java throws Illegal repetition /
    // Unclosed counted closure — the subset refuses identically instead
    // of literalizing '{'
    for (pat <- Seq("a{b}", "a{,5}", "a{2", "a{}"))
      assert(Matcher.tryCompile(pat).isEmpty, s"/$pat/ must not take the NFA path")
    intercept[java.util.regex.PatternSyntaxException](new RegexVerifier("a{b}"))
  }

  test("escapes outside the engine subset are rejected, not literalized") {
    import graft.queries.{Matcher, RegexVerifier}
    // r04: \1 is a BACKREFERENCE, \p{..}/\v/\Q..\E/\uHHHH are
    // java.util.regex constructs the subset does not implement —
    // literalizing them would silently change the match set
    val outOfSubset = Seq("(a)\\1", "\\p{Digit}+", "\\v", "a\\Qb\\E",
      "\\u0041", "[a\\v]", "[\\p{Digit}]", "[\\b]",
      // malformed \x escapes (Integer.parseInt would take the sign) and
      // the unclosed class `x[]` — java.util.regex rejects all of
      // these, so the subset must too (r04 4th pass)
      "\\x-1", "a\\x+4", "x[]")
    for (pat <- outOfSubset)
      assert(Matcher.tryCompile(pat).isEmpty, s"/$pat/ must not take the NFA path")
    // backreferences still answer through the step-bounded fallback
    val v = new RegexVerifier("(a)\\1")
    assert(!v.isLinear)
    assert(v.find("xaax") && !v.find("aba"))
    // [\b] is invalid in java.util.regex too (NOT backspace, as in
    // Perl/JS) — both engines refuse the pattern identically
    intercept[java.util.regex.PatternSyntaxException](new RegexVerifier("[\\b]"))
    for (pat <- Seq("\\x-1", "x[]"))
      intercept[java.util.regex.PatternSyntaxException](new RegexVerifier(pat))
    // POSIX-style leading-']' classes are VALID java.util.regex (verified
    // on this JVM) — the subset keeps them, agreeing on the match set
    for ((pat, yes, no) <- Seq(("[]a]+", "xx]aa", "xbx"), ("[^]a]", "]b]", "]a]"))) {
      val m = Matcher.tryCompile(pat)
      assert(m.nonEmpty, s"/$pat/ must stay on the NFA path")
      val jur = java.util.regex.Pattern.compile(pat)
      assert(m.get.find(yes) && jur.matcher(yes).find(), s"/$pat/ on $yes")
      assert(!m.get.find(no) && !jur.matcher(no).find(), s"/$pat/ on $no")
    }
    // NEGATED meta classes INSIDE a class compile to EXACT interval
    // complements on the linear path (2nd-pass code-review r04: the old
    // "everything" approximation made 'x[\D]' match "x5" and '[^\W]'
    // match nothing)
    for ((pat, yes, no) <- Seq(("x[\\D]", "x!", "x5"), ("[^\\W]", "a", "!"),
      ("[\\S]", "a", " "), ("q[^\\D2]", "q7", "qx"))) {
      val m = Matcher.tryCompile(pat)
      assert(m.nonEmpty, s"/$pat/ must stay on the NFA path")
      assert(m.get.find(yes) === java.util.regex.Pattern.compile(pat).matcher(yes).find())
      assert(m.get.find(yes) && !m.get.find(no), s"/$pat/")
    }
    assert(!Matcher.tryCompile("[^\\S\\s]").get.find("abcd 123")) // empty set
  }

  test("class atoms: escaped range bounds, NUL, meta-class bounds") {
    import graft.queries.Matcher
    // r04 parseClass rewrite: \x41 may bound a range ([\x41-\x5a] == A-Z)
    val hex = Matcher.tryCompile("[\\x41-\\x5a]+").get
    assert(hex.find("mnoPQRstu") && !hex.find("mnostu"))
    // \x00 is a real NUL atom, not a consumed-meta-class sentinel
    val nul = Matcher.tryCompile("[\\x00]").get
    assert(nul.find("a" + 0.toChar + "b") && !nul.find("ab"))
    // a meta class cannot bound a range (java.util.regex rejects it too)
    assert(Matcher.tryCompile("[a-\\d]").isEmpty)
    intercept[java.util.regex.PatternSyntaxException](
      java.util.regex.Pattern.compile("[a-\\d]"))
    // \s includes VERTICAL TAB 0x0B (java \s == [ \t\n\x0B\f\r]; a
    // two-range class split once dropped it — caught by the r04 fuzz)
    val vt = ("a" + 0x0b.toChar + "b", "a_b")
    assert(Matcher.tryCompile("a\\sb").get.find(vt._1))
    assert(!Matcher.tryCompile("a\\sb").get.find(vt._2))
    assert(Matcher.tryCompile("a[\\s]b").get.find(vt._1))
    assert(!Matcher.tryCompile("a\\Sb").get.find(vt._1))
  }

  test("grepContext agrees with the line goldens (reference grepTests)") {
    val spark = TestSpark.spark
    val df = spark.createDataFrame(Seq(
      (1L, "abc\ndef\nghalloo\n"),
      (2L, "xay\nxa\ny\n"))).toDF("docId", "text")
    val r1 = Search.grepContext(spark, df.filter(col("docId") === 1), "a+")
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1).toSeq
    assert(r1 == Seq((1, "abc"), (3, "ghalloo")))
    val r2 = Search.grepContext(spark, df.filter(col("docId") === 2), "x.*y")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(r2 == Seq((1, "xay")))
  }
}
