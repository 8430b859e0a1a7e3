package graft.codec

/** Burrows-Wheeler transform of a byte string.
  *
  * The conceptual value is the reference's `BWT a` = the length-(n+1)
  * sequence of symbols with exactly one end-of-string sentinel
  * (/root/reference/src/Data/BWT/Internal.hs:83-84, the sentinel is the
  * `Nothing`). We store it densely: `data` holds the n real bytes in BWT
  * order and `sentinelPos` is the conceptual index of the sentinel in
  * [0, n]. Empty input maps to the reference's `BWT Empty`
  * (/root/reference/src/Data/BWT.hs:58): `data` empty, `sentinelPos == -1`.
  */
final case class Bwt(data: Array[Byte], sentinelPos: Int) {
  def conceptualLength: Int = if (sentinelPos < 0) 0 else data.length + 1

  /** Byte of the conceptual stream at index i, or -1 for the sentinel. */
  def symbolAt(i: Int): Int =
    if (i == sentinelPos) -1
    else if (i < sentinelPos) data(i) & 0xFF
    else data(i - 1) & 0xFF

  override def equals(o: Any): Boolean = o match {
    case b: Bwt => sentinelPos == b.sentinelPos && java.util.Arrays.equals(data, b.data)
    case _      => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(data) * 31 + sentinelPos
}

/** Encode = `toBWT` (/root/reference/src/Data/BWT.hs:55-64): suffix array,
  * then for each suffix in rank order emit the preceding symbol, sentinel
  * when the suffix starts at position 0 (`saToBWT`, BWT/Internal.hs:98-106).
  *
  * Decode replaces the reference's sort + pointer walk (`fromBWT`,
  * BWT.hs:93-104 and `magicInverseBWT`, BWT/Internal.hs:163-200) with the
  * O(n) counting-sort LF-mapping — identical output, no comparison sort.
  */
object BwtCodec {

  def encode(t: Array[Byte]): Bwt = {
    val n = t.length
    if (n == 0) return Bwt(Array.emptyByteArray, -1)
    val sa = SuffixArrays.build(t)
    val out = new Array[Byte](n)
    var sentinel = -1
    var w = 0
    var i = 0
    while (i <= n) {
      val p = sa(i)
      if (p == 0) sentinel = i
      else { out(w) = t(p - 1); w += 1 }
      i += 1
    }
    Bwt(out, sentinel)
  }

  def decode(b: Bwt): Array[Byte] = {
    val n = b.data.length
    if (b.sentinelPos < 0) return Array.emptyByteArray
    if (n == 0) return Array.emptyByteArray

    // alphabet codes: 0 = sentinel, byte v -> v+1
    val counts = new Array[Int](258)
    counts(0) = 1
    var i = 0
    while (i < n) { counts((b.data(i) & 0xFF) + 1) += 1; i += 1 }
    val starts = new Array[Int](258)
    var sum = 0
    var c = 0
    while (c < 258) { starts(c) = sum; sum += counts(c); c += 1 }

    // LF(i) = C[L(i)] + rank(L(i), i): stable counting pass over L
    val lf = new Array[Int](n + 1)
    val seen = new Array[Int](258)
    i = 0
    while (i <= n) {
      val code = if (i == b.sentinelPos) 0 else (b.symbolAt(i) + 1)
      lf(i) = starts(code) + seen(code)
      seen(code) += 1
      i += 1
    }

    // Row 0 of the sorted rotations starts with the sentinel; its last
    // column entry L(0) is the final byte of the text. Following LF emits
    // the text right-to-left.
    val out = new Array[Byte](n)
    var p = 0
    var w = n - 1
    while (w >= 0) {
      out(w) = b.symbolAt(p).toByte
      p = lf(p)
      w -= 1
    }
    out
  }
}
