package graft.codec

import scala.collection.mutable

/** Simplified FSST (Fast Static Symbol Table — Boncz, Neumann & Leis,
  * VLDB 2020, public algorithm): a per-chunk table of up to 254 byte
  * sequences (length 2..4) built from a bounded sample; encoding replaces
  * the longest table match at each position with its 1-byte code, and
  * escapes literal bytes with code 255. Unlike general-purpose block
  * compressors this keeps values individually decodable, which is what a
  * columnar engine wants for string columns.
  *
  * Simplifications vs the paper (documented, deterministic): one-shot
  * n-gram frequency counting (2..4-grams) on the sample instead of the
  * iterative table refinement; greedy longest-match encoding.
  */
object Fsst {

  final val EscapeCode = 255
  final val MaxSymbols = 254
  private val SampleCap = 1 << 16

  final case class Table(symbols: Array[Array[Byte]]) {
    // index: first two bytes -> entries (longest first)
    @transient lazy val lookup: mutable.HashMap[Int, List[Int]] = {
      val m = mutable.HashMap.empty[Int, List[Int]]
      // insert shorter first so that prepending leaves longest at head
      symbols.zipWithIndex.sortBy(_._1.length).foreach { case (s, i) =>
        val key = ((s(0) & 0xFF) << 8) | (s(1) & 0xFF)
        m(key) = i :: m.getOrElse(key, Nil)
      }
      m
    }
  }

  /** Deterministic table build from sampled values. Grams of length 2..4
    * are packed into a primitive Long key (`len << 32 | bytes`), counted in
    * a LongMap — no boxing on the hot path.
    */
  def buildTable(values: Array[Array[Byte]]): Table = {
    val freq = new mutable.LongMap[Int](1 << 14)
    var sampled = 0
    var vi = 0
    while (vi < values.length && sampled < SampleCap) {
      val v = values(vi)
      val lim = math.min(v.length, SampleCap - sampled)
      var i = 0
      while (i < lim) {
        var packed = 0L
        var len = 0
        val maxLen = math.min(4, lim - i)
        while (len < maxLen) {
          packed = (packed << 8) | (v(i + len) & 0xFFL)
          len += 1
          if (len >= 2) {
            val key = (len.toLong << 32 << 8) | packed
            freq.update(key, freq.getOrElse(key, 0) + 1)
          }
        }
        i += 1
      }
      sampled += lim
      vi += 1
    }
    // gain = (len-1) * freq, must beat the table-entry cost; deterministic
    // tie-break on the packed gram key
    val picked = freq.iterator
      .map { case (key, f) =>
        val len = (key >>> 40).toInt
        (key, (len - 1).toLong * f)
      }
      .filter { case (key, gain) => gain >= ((key >>> 40) + 2) } // entry cost
      .toArray
      .sortWith { case ((k1, s1), (k2, s2)) =>
        if (s1 != s2) s1 > s2 else k1 < k2
      }
      .take(MaxSymbols)
      .map { case (key, _) =>
        val len = (key >>> 40).toInt
        val g = new Array[Byte](len)
        var j = 0
        while (j < len) { g(j) = ((key >>> ((len - 1 - j) * 8)) & 0xFF).toByte; j += 1 }
        g
      }
    Table(picked)
  }

  def serializeTable(t: Table): Array[Byte] = {
    val buf = new Bytes.Buf(t.symbols.length * 4 + 4)
    buf.writeVarInt(t.symbols.length)
    t.symbols.foreach { s => buf.writeVarInt(s.length); buf.writeBytes(s) }
    buf.toArray
  }

  def deserializeTable(rd: Bytes.Reader): Table = {
    val n = rd.readVarInt()
    val syms = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { syms(i) = rd.readBytes(rd.readVarInt()); i += 1 }
    Table(syms)
  }

  /** Greedy longest-match encode of one value. */
  def encodeValue(t: Table, v: Array[Byte], out: Bytes.Buf): Unit = {
    var i = 0
    while (i < v.length) {
      var best = -1
      var bestLen = 0
      if (i + 1 < v.length) {
        val key = ((v(i) & 0xFF) << 8) | (v(i + 1) & 0xFF)
        t.lookup.get(key) match {
          case Some(entries) =>
            var es = entries
            while (es.nonEmpty && best < 0) {
              val idx = es.head
              val s = t.symbols(idx)
              if (s.length <= v.length - i && regionEq(s, v, i)) {
                best = idx; bestLen = s.length
              }
              es = es.tail
            }
          case None =>
        }
      }
      if (best >= 0) { out.writeByte(best); i += bestLen }
      else { out.writeByte(EscapeCode); out.writeByte(v(i) & 0xFF); i += 1 }
    }
  }

  private def regionEq(s: Array[Byte], v: Array[Byte], off: Int): Boolean = {
    var j = 0
    while (j < s.length) {
      if (s(j) != v(off + j)) return false
      j += 1
    }
    true
  }

  def decodeValue(t: Table, enc: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new Bytes.Buf(len * 2)
    var i = off
    val end = off + len
    while (i < end) {
      val c = enc(i) & 0xFF
      if (c == EscapeCode) { out.writeByte(enc(i + 1) & 0xFF); i += 2 }
      else { out.writeBytes(t.symbols(c)); i += 1 }
    }
    out.toArray
  }
}
