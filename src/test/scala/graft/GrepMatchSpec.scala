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
