package graft.codec

/** Composed codec pipelines over one document's bytes, mirroring the
  * reference's promoted compositions (module docs,
  * /root/reference/src/Data/RLE.hs:15-22, MTF.hs:17-23: "Users will get the
  * most mileage by first compressing to a 'BWT'"):
  *
  *  - `bwtRle`      = text -> BWT -> RLE            (reference compress path 1)
  *  - `bwtMtf`      = text -> BWT -> MTF            (reference compress path 2)
  *  - `bwtMtfRle`   = text -> BWT -> MTF -> RLE     (north-rule high-entropy path)
  *
  * Each returns a self-describing byte payload; decode is bit-identical
  * (`decode(encode(x)) sameElements x`, the QuickCheck-style law).
  */
object Pipelines {

  /** BWT -> RLE, engine serialization. */
  def bwtRleEncode(text: Array[Byte]): Array[Byte] =
    RleCodec.serialize(RleCodec.encode(BwtCodec.encode(text)))

  def bwtRleDecode(payload: Array[Byte]): Array[Byte] =
    BwtCodec.decode(RleCodec.decode(RleCodec.deserialize(payload)))

  /** BWT -> MTF, engine serialization. */
  def bwtMtfEncode(text: Array[Byte]): Array[Byte] =
    MtfCodec.serialize(MtfCodec.encode(BwtCodec.encode(text)))

  def bwtMtfDecode(payload: Array[Byte]): Array[Byte] =
    BwtCodec.decode(MtfCodec.decode(MtfCodec.deserialize(payload)))

  /** BWT -> MTF -> RLE over the MTF index stream (runs of equal indices,
    * dominated by the 0-runs MTF produces on BWT output), varint-coded.
    *
    * Layout: varint total, varint alphaLen, alphabet bytes, then
    * (varint runLen, varint indexValue) pairs.
    */
  def bwtMtfRleEncode(text: Array[Byte]): Array[Byte] =
    mtfRleSerialize(MtfCodec.encode(BwtCodec.encode(text)))

  private def mtfRleSerialize(m: MtfChunk): Array[Byte] = {
    val buf = new Bytes.Buf(m.indices.length / 4 + m.alphabet.length + 16)
    buf.writeVarInt(m.indices.length)
    buf.writeVarInt(m.alphabet.length)
    buf.writeBytes(m.alphabet)
    var i = 0
    val len = m.indices.length
    while (i < len) {
      val v = m.indices(i)
      var j = i + 1
      while (j < len && m.indices(j) == v) j += 1
      buf.writeVarInt(j - i)
      buf.writeVarInt(v)
      i = j
    }
    buf.toArray
  }

  def bwtMtfRleDecode(payload: Array[Byte]): Array[Byte] = {
    val rd = new Bytes.Reader(payload)
    val totalLen = rd.readVarInt()
    // BWT only ever runs under MaxBwtDocBytes, so a larger declared stream
    // is corrupt — throw before the allocation, not OOM (FuzzDecodeSpec)
    require(totalLen >= 0 && totalLen <= ColumnCodec.MaxBwtDocBytes + 2,
      s"corrupt bwt+mtf+rle payload: declared length $totalLen")
    val alphaLen = rd.readVarInt()
    require(alphaLen >= 0 && alphaLen <= 257, s"corrupt payload: alphabet size $alphaLen")
    val alphabet = rd.readBytes(alphaLen)
    val indices = new Array[Int](totalLen)
    var w = 0
    while (w < totalLen) {
      val run = rd.readVarInt()
      val v = rd.readVarInt()
      var c = 0
      while (c < run) { indices(w) = v; w += 1; c += 1 }
    }
    BwtCodec.decode(MtfCodec.decode(MtfChunk(indices, alphabet)))
  }

  /** Direct RLE over raw bytes, no BWT, no sentinel — the reference's
    * direct `bytestringToRLEB`-style path (RLE.hs:155-159).
    * Layout: (varint runLen, byte) pairs.
    */
  def rleDirectEncode(bytes: Array[Byte]): Array[Byte] = {
    val buf = new Bytes.Buf(bytes.length / 2 + 8)
    buf.writeVarInt(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i)
      var j = i + 1
      while (j < bytes.length && bytes(j) == v) j += 1
      buf.writeVarInt(j - i)
      buf.writeByte(v & 0xFF)
      i = j
    }
    buf.toArray
  }

  def rleDirectDecode(payload: Array[Byte]): Array[Byte] = {
    val rd = new Bytes.Reader(payload)
    val n = rd.readVarInt()
    require(n >= 0 && n <= ColumnCodec.MaxDecodedValueBytes,
      s"corrupt rle payload: declared length $n")
    val out = new Array[Byte](n)
    var w = 0
    while (w < n) {
      val run = rd.readVarInt()
      val v = rd.readByte().toByte
      var c = 0
      while (c < run) { out(w) = v; w += 1; c += 1 }
    }
    out
  }

  /** Per-value text encoding: tagged best of {BWT+MTF+RLE, BWT+RLE, raw}.
    *
    * BWT+RLE with varint counts is byte-wise <= the reference's ASCII-count
    * stream pair-for-pair (a varint of any count <= its decimal digit
    * count), which makes the <=-reference size gate structural; BWT+MTF+RLE
    * usually wins on web text; raw floors high-entropy inputs.
    */
  def textEncode(value: Array[Byte]): Array[Byte] = {
    if (value.length > ColumnCodec.MaxBwtDocBytes) {
      // outlier gate: an SA build costs ~9x the input in task memory, so a
      // pathological document must never take the BWT path no matter which
      // caller reaches here (the chunk-level encodeBinary has the same cap).
      // Order-0 Huffman is O(n), constant-memory, and still ~0.6x on text.
      return textEncodeFast(value)
    }
    val bwt = BwtCodec.encode(value) // one SA build, all candidates reuse it
    val a = mtfRleSerialize(MtfCodec.encode(bwt))
    val b = RleCodec.serialize(RleCodec.encode(bwt))
    // entropy stage over the MTF+RLE stream: exact-size precheck so the
    // encode pass only runs when tag 3 would actually win
    val freq = Huffman.histogram(a)
    val lens = Huffman.codeLengths(freq)
    val hSize = Huffman.compressedSize(freq, lens, a.length)
    val others = math.min(math.min(a.length, b.length), value.length)
    val candidates =
      if (hSize < others) Seq(0 -> a, 1 -> b, 2 -> value, 3 -> Huffman.compressWith(a, lens))
      else Seq(0 -> a, 1 -> b, 2 -> value)
    val (bestTag, best) = candidates.minBy { case (tag, body) => (body.length, tag) }
    val out = new Array[Byte](best.length + 1)
    out(0) = bestTag.toByte
    System.arraycopy(best, 0, out, 1, best.length)
    out
  }

  /** Speed-biased per-value encoding: no BWT/SA work at all — order-0
    * Huffman with a raw floor, same self-describing tag space as
    * [[textEncode]] so [[textDecode]] reads both. ~6x the throughput of
    * the BWT pipeline at a weaker ratio (see BENCH/BASELINE.md bias rows).
    */
  def textEncodeFast(value: Array[Byte]): Array[Byte] = {
    val freq = Huffman.histogram(value)
    val lens = Huffman.codeLengths(freq)
    val (tag, body) =
      if (Huffman.compressedSize(freq, lens, value.length) < value.length)
        (4, Huffman.compressWith(value, lens))
      else (2, value)
    val out = new Array[Byte](body.length + 1)
    out(0) = tag.toByte
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  def textDecode(payload: Array[Byte]): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val body = java.util.Arrays.copyOfRange(payload, 1, payload.length)
    (payload(0): Int) match {
      case 0 => bwtMtfRleDecode(body)
      case 1 => BwtCodec.decode(RleCodec.decode(RleCodec.deserialize(body)))
      case 3 => bwtMtfRleDecode(Huffman.decompress(body))
      case 4 => Huffman.decompress(body) // huffman-over-raw (outlier gate)
      case _ => body
    }
  }

  /** Reference costing of the canonical compress pipelines for the
    * ≤-reference size gate (SURVEY.md §2.3). `refRleCost` is the
    * BWT->RLE ASCII stream; `refMtfCost` the BWT->MTF one.
    */
  def referenceCosts(text: Array[Byte]): (Long, Long) = {
    val b = BwtCodec.encode(text)
    (ReferenceRle.cost(b), MtfCodec.referenceCost(MtfCodec.encode(b)))
  }
}
