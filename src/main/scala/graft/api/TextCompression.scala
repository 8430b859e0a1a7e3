package graft.api

import java.nio.charset.StandardCharsets.UTF_8

import graft.codec._

/** Drop-in capability surface for users of the reference library
  * (Matthew-Mosior/text-compression). Every exported wrapper of the
  * reference's four modules maps onto one of the entry points below; the
  * {ByteString, Text} x {B, T} lattice (24 wrappers per codec module,
  * /root/reference/src/Data/RLE.hs:83-275, MTF.hs:82-283) collapses to the
  * UTF-8 boundary: `Text` inputs are UTF-8 encoded *before* any transform,
  * exactly as the reference does (BWT.hs:81; per-byte symbols RLE.hs:132),
  * and decoded after the inverse (BWT.hs:120-123).
  *
  * | reference                                  | here                          |
  * |--------------------------------------------|-------------------------------|
  * | toBWT / bytestringToBWT / textToBWT        | bwt(bytes) / bwt(string)      |
  * | fromBWT / *FromBWT                         | unbwt                         |
  * | *ToBWTToRLEB/T, *BWTToRLEB/T               | bwtRle / referenceRleTokens   |
  * | *FromBWTFromRLEB/T                         | unbwtRle                      |
  * | *ToRLEB/T (direct, no BWT)                 | rle / unrle                   |
  * | *ToBWTToMTFB/T, *FromBWTFromMTFB/T         | bwtMtf / unbwtMtf             |
  * | *ToMTFB/T (direct)                         | mtf / unmtf                   |
  * | *ToBWTToFMIndexB/T                         | fmIndex                       |
  * | seqFromRLE (stored-token interop)          | fromReferenceRleTokens        |
  * | seqFromMTF (stored-form interop)           | fromReferenceMtf              |
  * | seqFromFMIndex (+BWT inverse)              | FmIndex.bwt + unbwt           |
  * | countFMIndex  (S and P variants)           | count / countAll              |
  * | locateFMIndex (S and P variants)           | locate / locateAll            |
  *
  * The S/P (serial/parallel) FM variants collapse because parallelism over
  * patterns or documents is the engine's job (Spark tasks —
  * graft.spark.SearchJob); `countAll`/`locateAll` are the local many-
  * pattern forms. `compat = true` reproduces the reference's
  * skip-unknown-pattern-chars quirk (FMIndex/Internal.hs:390-391,420-423).
  */
object TextCompression {

  // ------------------------------------------------------------------ BWT

  def bwt(bytes: Array[Byte]): Bwt = BwtCodec.encode(bytes)
  def bwt(text: String): Bwt = BwtCodec.encode(text.getBytes(UTF_8))
  def unbwt(b: Bwt): Array[Byte] = BwtCodec.decode(b)
  def unbwtString(b: Bwt): String = new String(BwtCodec.decode(b), UTF_8)

  // ------------------------------------------------------------------ RLE

  /** Compress pipeline `input -> BWT -> RLE` (the module-doc-promoted
    * composition, RLE.hs:15-22), engine serialization.
    */
  def bwtRle(bytes: Array[Byte]): Array[Byte] = Pipelines.bwtRleEncode(bytes)
  def bwtRle(text: String): Array[Byte] = Pipelines.bwtRleEncode(text.getBytes(UTF_8))
  def unbwtRle(payload: Array[Byte]): Array[Byte] = Pipelines.bwtRleDecode(payload)
  def unbwtRleString(payload: Array[Byte]): String = new String(unbwtRle(payload), UTF_8)

  /** Direct RLE (no BWT) — the reference's `bytestringToRLEB` family. */
  def rle(bytes: Array[Byte]): Array[Byte] = Pipelines.rleDirectEncode(bytes)
  def unrle(payload: Array[Byte]): Array[Byte] = Pipelines.rleDirectDecode(payload)

  /** Bit-exact reference RLE token stream (quirks included) — for users
    * who need the reference's literal `RLE b` value or its byte costing.
    */
  def referenceRleTokens(bytes: Array[Byte]): Vector[Option[String]] =
    ReferenceRle.tokens(BwtCodec.encode(bytes))
  def referenceRleCost(bytes: Array[Byte]): Long =
    ReferenceRle.cost(BwtCodec.encode(bytes))

  /** The reference's `seqFromRLE` + BWT inverse
    * (RLE/Internal.hs:155-189, quirks included) — migrates values a user
    * stored in the reference's token format back to the original bytes.
    *
    * NOTE (accepted-input change vs earlier builds): the parse enforces a
    * decompression-bomb bound of `maxExpanded` symbols (default 4M — a
    * corrupt count token must throw promptly, not OOM the executor).
    * Migrations of legitimately larger single values must pass an explicit
    * larger bound; they are not silently truncated, they throw.
    */
  def fromReferenceRleTokens(
      tokens: Seq[Option[String]],
      maxExpanded: Int = 1 << 22): Array[Byte] =
    BwtCodec.decode(ReferenceRle.streamToBwt(ReferenceRle.parse(tokens, maxExpanded)))

  /** The reference's `seqFromMTF` + BWT inverse (MTF/Internal.hs:201-232):
    * decodes the reference's stored (indices, final recency list) pair.
    * Symbols in `storedList` are char codes; `None` is the sentinel.
    */
  def fromReferenceMtf(indices: Seq[Int], storedList: Seq[Option[Int]]): Array[Byte] =
    BwtCodec.decode(ReferenceRle.streamToBwt(ReferenceMtf.parse(indices, storedList)))

  // ------------------------------------------------------------------ MTF

  def bwtMtf(bytes: Array[Byte]): Array[Byte] = Pipelines.bwtMtfEncode(bytes)
  def bwtMtf(text: String): Array[Byte] = Pipelines.bwtMtfEncode(text.getBytes(UTF_8))
  def unbwtMtf(payload: Array[Byte]): Array[Byte] = Pipelines.bwtMtfDecode(payload)
  def unbwtMtfString(payload: Array[Byte]): String = new String(unbwtMtf(payload), UTF_8)

  /** Direct MTF of a raw byte stream (no BWT, no sentinel), returning the
    * reference's pair (indices, stored list = sorted-unique alphabet).
    */
  def mtf(bytes: Array[Byte]): MtfChunk = {
    // model the sentinel-free direct path: a Bwt with the sentinel
    // conceptually absent is not representable, so direct MTF runs the
    // same recency-list algorithm without the sentinel slot
    val present = new Array[Boolean](256)
    bytes.foreach(b => present(b & 0xFF) = true)
    val alphabet = (0 until 256).filter(present(_)).map(_.toByte).toArray
    val list = scala.collection.mutable.ArrayBuffer(alphabet.map(_ & 0xFF): _*)
    val indices = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val sym = bytes(i) & 0xFF
      val j = list.indexOf(sym)
      indices(i) = j
      list.remove(j)
      list.insert(0, sym)
      i += 1
    }
    MtfChunk(indices, alphabet)
  }

  def unmtf(m: MtfChunk): Array[Byte] = {
    val list = scala.collection.mutable.ArrayBuffer(m.alphabet.map(_ & 0xFF): _*)
    val out = new Array[Byte](m.indices.length)
    var i = 0
    while (i < m.indices.length) {
      val sym = list(m.indices(i))
      out(i) = sym.toByte
      list.remove(m.indices(i))
      list.insert(0, sym)
      i += 1
    }
    out
  }

  // ------------------------------------------------------------- FM-index

  def fmIndex(bytes: Array[Byte]): FmIndex = FmIndex.build(bytes)
  def fmIndex(text: String): FmIndex = FmIndex.build(text.getBytes(UTF_8))

  def count(idx: FmIndex, pattern: String, compat: Boolean = false): Option[Int] =
    idx.count(pattern.getBytes(UTF_8), compat)

  /** 1-based, row-ordered (unsorted) byte positions, as the reference's
    * locate returns them (FMIndex.hs:473-474,496).
    */
  def locate(idx: FmIndex, pattern: String, compat: Boolean = false): Array[Int] =
    idx.locate(pattern.getBytes(UTF_8), compat)

  /** Many-pattern forms (the reference's `...CountP`/`...LocateP` collapse
    * here; cluster-scale parallelism lives in graft.spark.SearchJob).
    */
  def countAll(idx: FmIndex, patterns: Seq[String], compat: Boolean = false): Seq[(String, Option[Int])] =
    patterns.map(p => p -> count(idx, p, compat))
  def locateAll(idx: FmIndex, patterns: Seq[String], compat: Boolean = false): Seq[(String, Array[Int])] =
    patterns.map(p => p -> locate(idx, p, compat))
}
