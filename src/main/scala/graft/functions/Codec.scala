package graft.functions

/** Posting-list compression codecs: unsigned LEB128 varint over deltas.
  *
  * Semantics mirror Debian/dcs's index format (reference:
  * `/root/reference/internal/index/write.go:275-441`,
  * `/root/reference/index/myvarint.go:10-115`,
  * `/root/reference/howto/index.md:140-199`) but the implementation is
  * new, pure-Scala, JIT-friendly (primitive arrays, no boxing):
  *
  *  - docid section: sorted DISTINCT docids, delta-encoded (first value
  *    absolute, then gaps); zero deltas (duplicate docids) are skipped by
  *    construction.
  *  - pos section: every occurrence; position deltas reset to the absolute
  *    position at each document boundary (write.go:359-369).
  *  - posrel section: 1 bit per pos entry; 1 = this entry starts a new
  *    docid, 0 = same docid as the previous entry (write.go:388-441).
  */
object Varint {

  /** Growable byte sink for varint encoding (no boxing, amortized O(1)). */
  final class Buf(initialCapacity: Int = 64) {
    private var arr = new Array[Byte](math.max(initialCapacity, 16))
    private var len = 0
    def size: Int = len
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length * 2
        while (cap < len + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def putByte(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    /** Unsigned LEB128: 7 bits per byte, high bit = continuation. */
    def putVarint(value: Long): Unit = {
      var v = value
      require(v >= 0, s"varint value must be non-negative, got $v")
      ensure(10)
      while ((v & ~0x7fL) != 0) {
        arr(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7
      }
      arr(len) = v.toByte; len += 1
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** Streaming varint reader over a byte array. */
  final class Reader(bytes: Array[Byte]) {
    private var off = 0
    def hasNext: Boolean = off < bytes.length
    def readVarint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = bytes(off) & 0xff; off += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def readVarintInt(): Int = readVarint().toInt
  }

  // ---- docid section ------------------------------------------------------

  /** Encode a sorted, distinct int sequence as first-absolute + gap varints. */
  def encodeDeltas(sorted: Array[Int]): Array[Byte] = {
    val buf = new Buf(sorted.length + 8)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i).toLong & 0xffffffffL
      val d = if (i == 0) v else v - prev
      require(i == 0 || d > 0, s"input not sorted-distinct at $i")
      buf.putVarint(d)
      prev = v
      i += 1
    }
    buf.result()
  }

  /** Decode delta+varint docids straight to global Long ids (local id +
    * shard base) — the form Catalyst array expressions want. */
  def decodeDeltasLong(bytes: Array[Byte], n: Int, base: Long): Array[Long] = {
    val out = new Array[Long](n)
    val r = new Reader(bytes)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = if (i == 0) r.readVarint() else prev + r.readVarint()
      out(i) = base + prev
      i += 1
    }
    out
  }

  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val r = new Reader(bytes)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = if (i == 0) r.readVarint() else prev + r.readVarint()
      out(i) = prev.toInt
      i += 1
    }
    out
  }

  /** Encode raw non-negative ints (e.g. per-doc term frequencies). */
  def encodeInts(values: Array[Int]): Array[Byte] = {
    val buf = new Buf(values.length + 8)
    var i = 0
    while (i < values.length) { buf.putVarint(values(i).toLong); i += 1 }
    buf.result()
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val r = new Reader(bytes)
    var i = 0
    while (i < n) { out(i) = r.readVarintInt(); i += 1 }
    out
  }

  // ---- pos + posrel sections ---------------------------------------------

  /** Encoded positional run for one term: positions delta-encoded with a
    * reset at each doc boundary, plus a posrel bitmap (1 bit per entry,
    * LSB-first within each byte; 1 = entry starts a new docid).
    */
  final case class PosRun(pos: Array[Byte], posrel: Array[Byte], n: Int)

  /** @param docIds parallel arrays: docIds(i) is the doc of occurrence i,
    *               positions(i) its position; MUST be sorted by
    *               (docId asc, position asc).
    */
  def encodePositions(docIds: Array[Int], positions: Array[Int]): PosRun = {
    require(docIds.length == positions.length)
    val pos = new Buf(positions.length + 8)
    val rel = new Buf(positions.length / 8 + 1)
    var relByte = 0; var relBits = 0
    var prevDoc = -1; var prevPos = 0
    var i = 0
    while (i < docIds.length) {
      val newDoc = docIds(i) != prevDoc
      if (newDoc) prevPos = 0
      pos.putVarint((positions(i) - prevPos).toLong)
      prevPos = positions(i)
      prevDoc = docIds(i)
      relByte |= (if (newDoc) 1 else 0) << relBits
      relBits += 1
      if (relBits == 8) { rel.putByte(relByte.toByte); relByte = 0; relBits = 0 }
      i += 1
    }
    if (relBits > 0) rel.putByte(relByte.toByte)
    PosRun(pos.result(), rel.result(), docIds.length)
  }

  /** Decode a PosRun given the term's sorted distinct docid list; returns
    * parallel (docIds, positions) of length run.n (3-way section zip,
    * reference `internal/index/read.go:447-479`). */
  def decodePositions(run: PosRun, docids: Array[Int]): (Array[Int], Array[Int]) = {
    val outDoc = new Array[Int](run.n)
    val outPos = new Array[Int](run.n)
    val r = new Reader(run.pos)
    var docIdx = -1
    var prevPos = 0
    var i = 0
    while (i < run.n) {
      val newDoc = ((run.posrel(i >> 3) >> (i & 7)) & 1) == 1
      if (newDoc) { docIdx += 1; prevPos = 0 }
      prevPos += r.readVarintInt()
      outDoc(i) = docids(docIdx)
      outPos(i) = prevPos
      i += 1
    }
    (outDoc, outPos)
  }
}
