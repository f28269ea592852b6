package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrigramCompiler

/** Golden tests for the regexp→trigram compiler, mirroring the reference's
  * table-driven cases (`internal/index/regexp_test.go:12-94`) — same
  * printed-query format. */
class TrigramCompilerSpec extends AnyFunSuite {

  val goldens: Seq[(String, String)] = Seq(
    ("Abcdef", """"Abc" "bcd" "cde" "def""""),
    ("(abc)(def)", """"abc" "bcd" "cde" "def""""),
    ("abc.*(def|ghi)", """"abc" ("def"|"ghi")"""),
    ("abc(def|ghi)", """"abc" ("bcd" "cde" "def")|("bcg" "cgh" "ghi")"""),
    ("a+hello", """"ahe" "ell" "hel" "llo""""),
    ("(a+hello|b+world)", """("ahe" "ell" "hel" "llo")|("bwo" "orl" "rld" "wor")"""),
    ("a*bbb", "\"bbb\""),
    ("a?bbb", "\"bbb\""),
    ("(bbb)a?", "\"bbb\""),
    ("(bbb)a*", "\"bbb\""),
    ("^abc", "\"abc\""),
    ("abc$", "\"abc\""),
    ("ab[cde]f", """("abc" "bcf")|("abd" "bdf")|("abe" "bef")"""),
    ("(abc|bac)de", """"cde" ("abc" "bcd")|("acd" "bac")"""),
    // not enough letters for a trigram -> always-match
    ("ab[^cde]f", "+"),
    ("ab.f", "+"),
    (".", "+"),
    ("()", "+"),
    // no matches
    ("[^\\s\\S]", "-"),
    // factoring
    ("(abc|abc)", "\"abc\""),
    ("(ab|ab)c", "\"abc\""),
    ("ab(cab|cat)", """"abc" "bca" ("cab"|"cat")"""),
    ("(z*(abc|def)z*)(z*(abc|def)z*)", """("abc"|"def")"""),
    ("(z*abcz*defz*)|(z*abcz*defz*)", """"abc" "def""""),
    ("(z*abcz*defz*(ghi|jkl)z*)|(z*abcz*defz*(mno|prs)z*)",
      """"abc" "def" ("ghi"|"jkl"|"mno"|"prs")"""),
    ("(z*(abcz*def)|(ghiz*jkl)z*)|(z*(mnoz*prs)|(tuvz*wxy)z*)",
      """("abc" "def")|("ghi" "jkl")|("mno" "prs")|("tuv" "wxy")"""),
    ("(z*abcz*defz*)(z*(ghi|jkl)z*)", """"abc" "def" ("ghi"|"jkl")"""),
    ("(z*abcz*defz*)|(z*(ghi|jkl)z*)", """("ghi"|"jkl")|("abc" "def")"""),
    // multiple possible prefixes/suffixes
    ("[ab][cd][ef]", """("ace"|"acf"|"ade"|"adf"|"bce"|"bcf"|"bde"|"bdf")"""),
    ("ab[cd]e", """("abc" "bce")|("abd" "bde")"""),
    // different sized suffixes
    ("(a|ab)cde", """"cde" ("abc" "bcd")|("acd")"""),
    ("(a|b|c|d)(ef|g|hi|j)", "+"),
    ("(?s).", "+"),
    // case folding
    ("(?i)a~~", """("A~~"|"a~~")"""),
    ("(?i)ab~", """("AB~"|"Ab~"|"aB~"|"ab~")"""),
    ("(?i)abc", """("ABC"|"ABc"|"AbC"|"Abc"|"aBC"|"aBc"|"abC"|"abc")"""),
    ("(?i)abc|def",
      """("ABC"|"ABc"|"AbC"|"Abc"|"DEF"|"DEf"|"DeF"|"Def"|"aBC"|"aBc"|"abC"|"abc"|"dEF"|"dEf"|"deF"|"def")"""),
    ("(?i)abcd",
      """("ABC"|"ABc"|"AbC"|"Abc"|"aBC"|"aBc"|"abC"|"abc") ("BCD"|"BCd"|"BcD"|"Bcd"|"bCD"|"bCd"|"bcD"|"bcd")"""),
    ("(?i)abc|abc", """("ABC"|"ABc"|"AbC"|"Abc"|"aBC"|"aBc"|"abC"|"abc")"""),
    // word boundaries are zero-width: no trigram impact
    ("\\b", "+"),
    ("\\B", "+"),
    ("\\babc", "\"abc\""),
    ("\\Babc", "\"abc\""),
    ("abc\\b", "\"abc\""),
    ("abc\\B", "\"abc\""),
    ("ab\\bc", "\"abc\""),
    ("ab\\Bc", "\"abc\""))

  test("golden trigram queries match the reference's printed forms") {
    val failures = goldens.flatMap { case (re, want) =>
      val got =
        try TrigramCompiler.compile(re).toString
        catch { case e: Exception => s"<exception: ${e.getMessage}>" }
      if (got == want) None else Some(s"  $re\n    got:  $got\n    want: $want")
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  test("out-of-subset syntax raises ParseError instead of a wrong query (r04)") {
    // a backreference literalized as '1' would produce a candidate query
    // that is NOT conservative (misses 'aa' docs for /(a)\1/) — the
    // compiler must refuse so the search layer falls back to the scan
    for (pat <- Seq("(a)\\1", "\\p{Digit}+", "a\\Qb\\E", "\\v"))
      intercept[graft.queries.Regex.ParseError](TrigramCompiler.compile(pat))
  }

  test("conservativeness property: matching strings satisfy the query") {
    // for random strings that MATCH the regex, the trigram query must be
    // satisfied by the string's trigram set (the core soundness invariant)
    val res = Seq("abc(def|ghi)", "a+hello", "(abc|bac)de", "ab[cd]e",
      "x.{0,3}yz", "(foo|bar)+baz")
    // witnesses guarantee each regex gets non-vacuous coverage
    val witnesses = Seq("abcdef", "abcghi", "aahello", "bacde", "abde",
      "xqqyz", "foobarbaz", "barbaz")
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghixyz"
    def satisfies(q: graft.queries.TriQuery, tris: Set[String]): Boolean = q.op match {
      case graft.queries.TriQuery.QAll => true
      case graft.queries.TriQuery.QNone => false
      case graft.queries.TriQuery.QAnd =>
        q.trigram.forall(tris) && q.sub.forall(s => satisfies(s, tris))
      case graft.queries.TriQuery.QOr =>
        q.trigram.exists(tris) || q.sub.exists(s => satisfies(s, tris))
    }
    for (re <- res) {
      val q = TrigramCompiler.compile(re)
      val p = java.util.regex.Pattern.compile(re)
      var matched = 0
      for (_ <- 1 to 4000) {
        val s = Array.fill(3 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
        // embed a witness (guaranteed match) or random junk
        val str = if (rnd.nextBoolean()) s + witnesses(rnd.nextInt(witnesses.length)) + s.take(3) else s
        if (p.matcher(str).find()) {
          matched += 1
          val tris = (0 to str.length - 3).map(i => str.substring(i, i + 3)).toSet
          assert(satisfies(q, tris), s"query $q not satisfied by matching string '$str' for /$re/")
        }
      }
      assert(matched > 0, s"no random matches generated for /$re/ — test vacuous")
    }
  }
}
