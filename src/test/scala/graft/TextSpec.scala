package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Pins the zero-copy ASCII fast paths (countTokens, indexableAscii, the
  * folded tokenizer used by ShardIndexer) to the String.toLowerCase-based
  * reference semantics across mixed-case, punctuation, non-ASCII and
  * degenerate inputs. */
class TextSpec extends AnyFunSuite {

  val samples: Seq[String] = Seq(
    "",
    "a",
    "The Quick BROWN fox-jumps over 42 lazy DOGS!!",
    "  multiple   spaces\tand\nnewlines  ",
    "ALLCAPS lower MiXeD 0123456789",
    "punct.only...:::---",
    "ünïcode Café NAÏVE straße ΣΙΓΜΑ",
    "mixed ASCII und Ümlaute DAZWISCHEN",
    "a1B2c3D4",
    "trailing token END")

  test("countTokens == tokenize(_).length on every sample") {
    samples.foreach { s =>
      assert(Text.countTokens(s) == Text.tokenize(s).length, s"text='$s'")
    }
  }

  test("isAscii detects non-ASCII") {
    assert(Text.isAscii("plain ASCII 123 !?"))
    assert(!Text.isAscii("café"))
  }

  test("indexableAscii matches indexableBytes on ASCII inputs") {
    val seen1 = new java.util.BitSet(1 << 24)
    val seen2 = new java.util.BitSet(1 << 24)
    val longLine = "x" * 2500
    val ok = samples.filter(Text.isAscii) ++ Seq("abc", "ab", longLine,
      "short\n" + longLine, ("ab" * 1200) + "\n" + ("cd" * 900))
    ok.foreach { s =>
      val a = Text.indexableAscii(s, seen1)
      val b = Text.indexableBytes(s.getBytes("UTF-8"), seen2)
      assert(a == b, s"len=${s.length} head='${s.take(30)}'")
    }
  }

  test("folded shard tokenizer produces identical postings to the generic path") {
    // index the same mixed-case docs through both ShardIndexer paths by
    // comparing a build over mixed-case text vs pre-lowercased text: the
    // postings must be byte-identical (folding == String.toLowerCase for
    // these inputs)
    val spark = TestSpark.spark
    val texts = Seq(
      "The Quick BROWN Fox JUMPS high",
      "ALLCAPS and lower and 42 Numbers7",
      "Repeat repeat REPEAT rePEAT",
      "Punct... separated;TOKENS-here")
    val rows = texts.zipWithIndex.map { case (t, i) => (f"u$i%04d", t, "en") }
    val rowsLower = rows.map { case (u, t, l) => (u, t.toLowerCase(java.util.Locale.ROOT), l) }
    val cfg = graft.index.IndexBuilder.Config(
      docsPerShard = 2, blockSize = 4, partitions = 2, buildTrigrams = false)
    def blocksOf(rs: Seq[(String, String, String)]) = {
      val df = spark.createDataFrame(rs).toDF("url", "text", "lang")
      graft.index.IndexBuilder.build(spark, df, cfg).postings.collect()
        .sortBy(b => (b.term, b.shard, b.blockId))
        .map(b => (b.term, b.shard, b.blockId, b.df, b.cf, b.maxTf,
          b.docs.toSeq, b.tfs.toSeq, b.pos.toSeq, b.posrel.toSeq)).toSeq
    }
    assert(blocksOf(rows) == blocksOf(rowsLower))
  }

  test("non-ASCII documents fall back to reference tokenization") {
    val spark = TestSpark.spark
    val rows = Seq(("u0", "Café München DATA café straße data", "de"))
    val cfg = graft.index.IndexBuilder.Config(
      docsPerShard = 4, blockSize = 4, partitions = 1, buildTrigrams = false)
    val df = spark.createDataFrame(rows).toDF("url", "text", "lang")
    val idx = graft.index.IndexBuilder.build(spark, df, cfg)
    val terms = idx.postings.collect().map(_.term).toSet
    // accented chars act as separators after lowercasing: caf / m / nchen...
    val expect = Text.tokenize(rows.head._2).toSet
    assert(terms == expect)
    assert(terms.contains("data") && terms.contains("caf"))
  }
}
