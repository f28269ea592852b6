package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Varint

class CodecSpec extends AnyFunSuite {

  test("docid delta golden: [3, 32768, 32769] -> deltas [3, 32765, 1]") {
    // Example from the reference's format doc (howto/index.md:159-162).
    val bytes = Varint.encodeDeltas(Array(3, 32768, 32769))
    // 3 -> [0x03]; 32765 -> LEB128 [0xfd 0xff 0x01]; 1 -> [0x01]
    assert(bytes.toSeq == Seq(0x03, 0xfd.toByte, 0xff.toByte, 0x01, 0x01).map(_.toByte))
    assert(Varint.decodeDeltas(bytes, 3).toSeq == Seq(3, 32768, 32769))
  }

  test("pos/posrel golden: doc5@[7,500], doc9@[0]") {
    // Example from howto/index.md:190-199: pos deltas [7,493,0], posrel 1,0,1.
    val run = Varint.encodePositions(Array(5, 5, 9), Array(7, 500, 0))
    assert(run.pos.toSeq == Seq(0x07, 0xed.toByte, 0x03, 0x00).map(_.toByte))
    // bits LSB-first: entry0=1 (new doc), entry1=0, entry2=1 -> 0b101 = 5
    assert(run.posrel.toSeq == Seq(5.toByte))
    val (docs, poss) = Varint.decodePositions(run, Array(5, 9))
    assert(docs.toSeq == Seq(5, 5, 9))
    assert(poss.toSeq == Seq(7, 500, 0))
  }

  test("varint round-trip property: sorted distinct lists (seeded random)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val sorted = Array.fill(n)(rnd.nextInt(Int.MaxValue)).distinct.sorted
      val enc = Varint.encodeDeltas(sorted)
      assert(Varint.decodeDeltas(enc, sorted.length).toSeq == sorted.toSeq)
    }
  }

  test("raw int round-trip property (seeded random)") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 200) {
      val arr = Array.fill(rnd.nextInt(300))(rnd.nextInt(Int.MaxValue))
      assert(Varint.decodeInts(Varint.encodeInts(arr), arr.length).toSeq == arr.toSeq)
    }
  }

  test("positions round-trip property (seeded random)") {
    val rnd = new scala.util.Random(44)
    for (_ <- 1 to 200) {
      val entries = Array.fill(rnd.nextInt(400))((rnd.nextInt(50), rnd.nextInt(10000)))
        .distinct.sorted
      val docs = entries.map(_._1)
      val poss = entries.map(_._2)
      val run = Varint.encodePositions(docs, poss)
      val (d2, p2) = Varint.decodePositions(run, docs.distinct)
      assert(d2.toSeq == docs.toSeq)
      assert(p2.toSeq == poss.toSeq)
    }
  }

  test("posrel packs 8 entries per byte") {
    // 9 single-occurrence docs -> 9 bits -> 2 bytes
    val docs = Array.tabulate(9)(identity)
    val run = Varint.encodePositions(docs, Array.fill(9)(0))
    assert(run.posrel.length == 2)
    assert((run.posrel(0) & 0xff) == 0xff)
    assert((run.posrel(1) & 0xff) == 0x01)
  }

  test("large values and compression effectiveness") {
    // dense docid list: gaps of 1 -> ~1 byte per posting vs 4 raw
    val dense = Array.tabulate(100000)(identity)
    val enc = Varint.encodeDeltas(dense)
    assert(enc.length < 100001) // first byte + 1 byte/gap
    assert(Varint.decodeDeltas(enc, dense.length).last == 99999)
    // values near uint32 max round-trip through the Long-based codec
    val big = Array(Int.MaxValue - 2, Int.MaxValue - 1, Int.MaxValue)
    assert(Varint.decodeDeltas(Varint.encodeDeltas(big), 3).toSeq == big.toSeq)
  }
}
