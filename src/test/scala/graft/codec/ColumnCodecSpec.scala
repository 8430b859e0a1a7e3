package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class ColumnCodecSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("bit packing roundtrip") {
    val rnd = new scala.util.Random(41)
    (0 to 64).foreach { width =>
      val n = rnd.nextInt(100) + 1
      val max = if (width == 0) 0L else if (width == 64) Long.MaxValue else (1L << width) - 1
      val vals = Array.fill(n)(if (max == 0) 0L else rnd.nextLong() & max)
      val un = Bytes.unpackBits(Bytes.packBits(vals, width), n, width)
      assert(un.toSeq == vals.toSeq, s"width $width")
    }
  }

  test("varint / zigzag roundtrip") {
    val vals = Seq(0L, 1L, -1L, 127L, 128L, -128L, Int.MaxValue.toLong, Long.MaxValue, Long.MinValue)
    val buf = new Bytes.Buf()
    vals.foreach(buf.writeZigZag)
    val rd = new Bytes.Reader(buf.toArray)
    vals.foreach(v => assert(rd.readZigZag() == v))
    // max-length legitimate varint (10 bytes, e.g. -1L unsigned) decodes;
    // an 11th continuation byte would wrap shift mod 64 into a bogus small
    // value that bypasses size guards — it must throw instead
    val ok = new Bytes.Buf(); ok.writeVarLong(-1L)
    assert(new Bytes.Reader(ok.toArray).readVarLong() == -1L)
    val bomb = Array.fill[Byte](12)(0xFF.toByte)
    intercept[IllegalArgumentException](new Bytes.Reader(bomb).readVarLong())
  }

  test("binary column: auto-selected codecs roundtrip on characteristic shapes") {
    val rnd = new scala.util.Random(43)
    val langs = Array("en", "fr", "es", "zh", "de")
    val shapes: Seq[Array[Array[Byte]]] = Seq(
      Array.empty[Array[Byte]],
      Array(Array.emptyByteArray),
      // low-distinct -> dict
      Array.fill(500)(bytes(langs(rnd.nextInt(5)))),
      // runs-heavy -> rle
      Array.tabulate(400)(i => bytes(langs(i / 100))),
      // short text-ish -> fsst
      Array.fill(200)(bytes("user-" + rnd.nextInt(50) + "@example.com")),
      // long text -> bwt pipeline
      Array.fill(8) {
        val sb = new StringBuilder
        (1 to 200).foreach(_ => sb.append(Seq("lorem", "ipsum", "dolor", "sit")(rnd.nextInt(4))).append(' '))
        bytes(sb.toString)
      },
      // high entropy -> raw fallback
      Array.fill(50)(Array.fill(30)(rnd.nextInt(256).toByte))
    )
    shapes.foreach { vals =>
      val enc = ColumnCodec.encodeBinary(vals)
      val dec = ColumnCodec.decodeBinary(enc)
      assert(dec.length == vals.length)
      vals.indices.foreach(i => assert(dec(i).sameElements(vals(i)), s"value $i (${ColumnCodec.codecName(enc)})"))
      // determinism
      assert(ColumnCodec.encodeBinary(vals).sameElements(enc))
    }
  }

  test("binary column: expected codec choices") {
    val rnd = new scala.util.Random(47)
    val langs = Array("en", "fr", "es", "zh", "de")
    def base(payload: Array[Byte]): String =
      ColumnCodec.codecName(payload).stripPrefix("huf+")
    val dictish = Array.fill(500)(bytes(langs(rnd.nextInt(5))))
    assert(base(ColumnCodec.encodeBinary(dictish)) == "dict")
    val runish = Array.tabulate(400)(i => bytes(langs(i / 100)))
    val runCodec = base(ColumnCodec.encodeBinary(runish))
    assert(runCodec == "rle" || runCodec == "dict") // both tiny; selector picks min
    val entropic = Array.fill(50)(Array.fill(30)(rnd.nextInt(256).toByte))
    assert(base(ColumnCodec.encodeBinary(entropic)) == "raw")
  }

  test("long column: auto-selected codecs roundtrip") {
    val rnd = new scala.util.Random(53)
    val shapes: Seq[Array[Long]] = Seq(
      Array.empty[Long],
      Array(42L),
      Array.fill(300)(7L), // constant -> rle
      Array.tabulate(500)(i => 1666000000000000L + i * 1000L), // sorted ts -> delta
      Array.fill(400)(rnd.nextInt(1000).toLong), // narrow -> for_bitpack
      Array.fill(100)(rnd.nextLong()), // wide random
      Array.tabulate(300)(i => i.toLong * (if (i % 2 == 0) 1 else -1))
    )
    shapes.foreach { vals =>
      val enc = ColumnCodec.encodeLong(vals)
      assert(ColumnCodec.decodeLong(enc).toSeq == vals.toSeq, ColumnCodec.codecName(enc))
      assert(ColumnCodec.encodeLong(vals).sameElements(enc))
    }
  }

  test("long column: expected codec choices") {
    def base(payload: Array[Byte]): String =
      ColumnCodec.codecName(payload).stripPrefix("huf+")
    // constant column: rle_long and delta_for (width 0) are both ~5 bytes
    val constCodec = base(ColumnCodec.encodeLong(Array.fill(300)(7L)))
    assert(constCodec == "rle_long" || constCodec == "delta_for")
    val sortedTs = Array.tabulate(500)(i => 1666000000000000L + i * 1000L)
    assert(base(ColumnCodec.encodeLong(sortedTs)) == "delta_for")
    val rnd = new scala.util.Random(59)
    val narrow = Array.fill(400)(rnd.nextInt(1000).toLong)
    assert(base(ColumnCodec.encodeLong(narrow)) == "for_bitpack")
  }

  test("fsst encodes repetitive strings smaller than raw") {
    val vals = Array.fill(300)(bytes("https://host-42.example.com/path/to/page"))
    val fsst = ColumnCodec.encodeFsst(vals)
    val raw = ColumnCodec.encodeRawBin(vals)
    assert(fsst.length < raw.length)
    val dec = ColumnCodec.decodeBinary(fsst)
    vals.indices.foreach(i => assert(dec(i).sameElements(vals(i))))
  }
}
