package graft.codec

/** Little-endian varint / zigzag / bit-packing primitives shared by all
  * engine serialization formats. Pure JVM — no Spark dependency — so the
  * kernels are unit-testable and usable inside `Dataset.mapPartitions`
  * closures without shipping anything beyond the closure itself.
  */
object Bytes {

  /** Growable byte buffer tuned for codec output (no boxing, amortized
    * doubling, cheap `toArray`).
    */
  final class Buf(initial: Int = 64) {
    private var arr = new Array[Byte](math.max(initial, 16))
    private var len = 0

    def size: Int = len

    private def ensure(extra: Int): Unit = {
      if (len + extra > arr.length) {
        var cap = arr.length
        while (cap < len + extra) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    }

    def writeByte(b: Int): Unit = { ensure(1); arr(len) = b.toByte; len += 1 }

    def writeBytes(bs: Array[Byte]): Unit = writeBytes(bs, 0, bs.length)

    def writeBytes(bs: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(bs, off, arr, len, n); len += n
    }

    /** Unsigned LEB128. */
    def writeVarLong(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0L) { writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      writeByte(v.toInt)
    }

    def writeVarInt(v: Int): Unit = writeVarLong(v.toLong & 0xFFFFFFFFL)

    def writeZigZag(v: Long): Unit = writeVarLong((v << 1) ^ (v >> 63))

    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** Cursor over a byte array for decode paths. */
  final class Reader(val arr: Array[Byte], var pos: Int = 0) {
    def readByte(): Int = { val b = arr(pos) & 0xFF; pos += 1; b }

    def readBytes(n: Int): Array[Byte] = {
      // strict: a truncated/corrupt payload must throw, not zero-pad
      // (copyOfRange silently pads past the end)
      require(n >= 0 && n <= arr.length - pos,
        s"corrupt payload: need $n bytes at $pos of ${arr.length}")
      val out = java.util.Arrays.copyOfRange(arr, pos, pos + n); pos += n; out
    }

    /** VarInt that must be a sane element count for a decode-side array
      * allocation: non-negative and no larger than `bytesPerElement`
      * payload bytes could possibly encode — a corrupt length varint must
      * throw promptly, not OOM the executor with a multi-GB allocation.
      */
    def readVarSize(bytesPerElement: Int = 1): Int = {
      val v = readVarLong()
      require(v >= 0 && v <= remaining.toLong / bytesPerElement + 1,
        s"corrupt payload: implausible element count $v with $remaining bytes left")
      v.toInt
    }

    def readVarLong(): Long = {
      var shift = 0; var result = 0L; var b = 0
      do {
        // a 64-bit value needs at most 10 LEB128 bytes (last shift = 63);
        // an 11th continuation byte would wrap the shift mod 64 and silently
        // yield a bogus small value that bypasses the size guards downstream
        require(shift < 64, s"corrupt payload: malformed varint (>10 bytes) at $pos")
        b = arr(pos) & 0xFF; pos += 1
        result |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    def readVarInt(): Int = readVarLong().toInt

    def readZigZag(): Long = { val v = readVarLong(); (v >>> 1) ^ -(v & 1) }

    def remaining: Int = arr.length - pos
  }

  /** Bits needed to represent v (0 -> 0 bits). */
  def bitsFor(v: Long): Int = if (v == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Pack `values` (each < 2^width) into a fresh byte array, LSB-first. */
  def packBits(values: Array[Long], width: Int): Array[Byte] = {
    if (width == 0) return Array.emptyByteArray
    val totalBytes = (values.length.toLong * width + 7) / 8
    require(totalBytes <= Int.MaxValue,
      s"packBits output would need $totalBytes bytes (${values.length} values x $width bits)")
    val out = new Array[Byte](totalBytes.toInt)
    var bitPos = 0L
    var i = 0
    while (i < values.length) {
      var v = values(i)
      var rem = width
      while (rem > 0) {
        val byteIdx = (bitPos >>> 3).toInt
        val bitOff = (bitPos & 7).toInt
        val take = math.min(8 - bitOff, rem)
        out(byteIdx) = (out(byteIdx) | ((v & ((1L << take) - 1)) << bitOff)).toByte
        v >>>= take
        rem -= take
        bitPos += take
      }
      i += 1
    }
    out
  }

  /** Inverse of [[packBits]]. */
  def unpackBits(bytes: Array[Byte], n: Int, width: Int): Array[Long] = {
    val out = new Array[Long](n)
    if (width == 0) return out
    var bitPos = 0L
    var i = 0
    while (i < n) {
      var v = 0L
      var got = 0
      while (got < width) {
        val byteIdx = (bitPos >>> 3).toInt
        val bitOff = (bitPos & 7).toInt
        val take = math.min(8 - bitOff, width - got)
        val bits = ((bytes(byteIdx) & 0xFF) >>> bitOff) & ((1 << take) - 1)
        v |= bits.toLong << got
        got += take
        bitPos += take
      }
      out(i) = v
      i += 1
    }
    out
  }
}
