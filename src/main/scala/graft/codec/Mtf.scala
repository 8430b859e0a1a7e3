package graft.codec

/** Move-to-front transform of a sentinel-bearing symbol stream.
  *
  * Reference semantics (/root/reference/src/Data/MTF/Internal.hs:128-175):
  * the initial recency list is the sorted-unique symbol set of the stream
  * with the sentinel first (`nubSeq'`, :79-99 — `Nothing` sorts before every
  * `Just`); each symbol emits its 0-based position in the current list and
  * is moved to the front. The reference stores the FINAL list and decode
  * re-derives the initial list by sort-unique (:214). We store the sorted
  * alphabet directly — exactly what decode recomputes — so the stored value
  * is the canonical form of the same information.
  *
  * `alphabet` = distinct real byte values, sorted ascending (unsigned);
  * the conceptual initial list is sentinel +: alphabet. `indices` covers the
  * conceptual n+1 stream. Empty input -> empty indices + empty alphabet
  * (MTF/Internal.hs:129).
  */
final case class MtfChunk(indices: Array[Int], alphabet: Array[Byte]) {
  /** Alphabet size including the sentinel slot. */
  def sigma: Int = alphabet.length + 1
}

object MtfCodec {

  def encode(b: Bwt): MtfChunk = {
    val total = b.conceptualLength
    if (total == 0) return MtfChunk(Array.emptyIntArray, Array.emptyByteArray)
    val n = b.data.length

    val present = new Array[Boolean](256)
    var i = 0
    while (i < n) { present(b.data(i) & 0xFF) = true; i += 1 }
    var sigmaReal = 0
    i = 0
    while (i < 256) { if (present(i)) sigmaReal += 1; i += 1 }
    val alphabet = new Array[Byte](sigmaReal)
    var w = 0
    i = 0
    while (i < 256) { if (present(i)) { alphabet(w) = i.toByte; w += 1 }; i += 1 }

    // recency list of symbol codes; -1 = sentinel. Initial: sentinel first,
    // then sorted bytes (nubSeq' order).
    val list = new Array[Int](sigmaReal + 1)
    list(0) = -1
    i = 0
    while (i < sigmaReal) { list(i + 1) = alphabet(i) & 0xFF; i += 1 }

    val indices = new Array[Int](total)
    i = 0
    while (i < total) {
      val sym = b.symbolAt(i)
      var j = 0
      while (list(j) != sym) j += 1
      indices(i) = j
      while (j > 0) { list(j) = list(j - 1); j -= 1 }
      list(0) = sym
      i += 1
    }
    MtfChunk(indices, alphabet)
  }

  def decode(m: MtfChunk): Bwt = {
    val total = m.indices.length
    if (total == 0) return Bwt(Array.emptyByteArray, -1)
    val sigmaReal = m.alphabet.length
    val list = new Array[Int](sigmaReal + 1)
    list(0) = -1
    var i = 0
    while (i < sigmaReal) { list(i + 1) = m.alphabet(i) & 0xFF; i += 1 }

    val data = new Array[Byte](total - 1)
    var sentinelPos = -1
    var w = 0
    i = 0
    while (i < total) {
      var j = m.indices(i)
      val sym = list(j)
      if (sym < 0) sentinelPos = i
      else { data(w) = sym.toByte; w += 1 }
      while (j > 0) { list(j) = list(j - 1); j -= 1 }
      list(0) = sym
      i += 1
    }
    Bwt(data, sentinelPos)
  }

  /** Replay to the reference's stored FINAL recency list (sentinel as None)
    * — used only by golden tests pinning MTF/Internal.hs:128-175.
    */
  def finalList(b: Bwt): Vector[Option[Int]] = {
    val m = encode(b)
    val sigmaReal = m.alphabet.length
    val list = scala.collection.mutable.ArrayBuffer[Int](-1)
    list ++= m.alphabet.map(_ & 0xFF)
    var i = 0
    while (i < m.indices.length) {
      val j = m.indices(i)
      val sym = list.remove(j)
      list.insert(0, sym)
      i += 1
    }
    list.toVector.map(c => if (c < 0) None else Some(c))
  }

  /** Reference MTF size costing (SURVEY.md §2.3): ASCII-decimal indices plus
    * one byte per stored-list symbol (sentinel slot included).
    */
  def referenceCost(m: MtfChunk): Long = {
    var bytes = 0L
    var i = 0
    while (i < m.indices.length) { bytes += m.indices(i).toString.length; i += 1 }
    bytes + m.alphabet.length + 1
  }

  /** Engine serialization: varint count, alphabet, then indices bit-packed
    * to ceil(log2(sigma)) bits.
    */
  def serialize(m: MtfChunk): Array[Byte] = {
    val buf = new Bytes.Buf(m.indices.length / 2 + m.alphabet.length + 8)
    buf.writeVarInt(m.indices.length)
    buf.writeVarInt(m.alphabet.length)
    buf.writeBytes(m.alphabet)
    val width = math.max(1, Bytes.bitsFor(m.sigma - 1L))
    buf.writeByte(width)
    buf.writeBytes(Bytes.packBits(m.indices.map(_.toLong), width))
    buf.toArray
  }

  def deserialize(bytes: Array[Byte]): MtfChunk = {
    val rd = new Bytes.Reader(bytes)
    val total = rd.readVarInt()
    require(total >= 0 && total <= ColumnCodec.MaxBwtDocBytes + 2,
      s"corrupt MTF payload: declared length $total")
    val alphaLen = rd.readVarInt()
    require(alphaLen >= 0 && alphaLen <= 256, s"corrupt MTF payload: alphabet size $alphaLen")
    val alphabet = rd.readBytes(alphaLen)
    val width = rd.readByte()
    val packed = rd.readBytes(rd.remaining)
    val indices = Bytes.unpackBits(packed, total, width).map(_.toInt)
    MtfChunk(indices, alphabet)
  }
}

/** Decoder for the reference's stored MTF form — (indices, FINAL recency
  * list) — implementing `seqFromMTF`
  * (/root/reference/src/Data/MTF/Internal.hs:201-232) exactly:
  *  - empty indices OR empty stored list -> empty output (:203-210);
  *  - the initial recency list is re-derived from the stored final list by
  *    `nubSeq'` (sort-unique, sentinel `None` first, :214-216);
  *  - each index emits the element at that position and moves it to the
  *    front; an out-of-range index fails (the reference's `DS.index`
  *    crash, surfaced as IndexOutOfBoundsException here).
  * Symbols are char codes; `None` = sentinel. Migrated values reassemble
  * into a [[Bwt]] via [[ReferenceRle.streamToBwt]].
  */
object ReferenceMtf {

  def parse(indices: Seq[Int], storedList: Seq[Option[Int]]): Vector[Option[Int]] = {
    if (indices.isEmpty || storedList.isEmpty) return Vector.empty
    val il = scala.collection.mutable.ArrayBuffer.empty[Option[Int]]
    if (storedList.contains(None)) il += None
    storedList.flatten.distinct.sorted.foreach(u => il += Some(u))
    val out = Vector.newBuilder[Option[Int]]
    indices.foreach { y =>
      val e = il.remove(y)
      out += e
      il.insert(0, e)
    }
    out.result()
  }
}
