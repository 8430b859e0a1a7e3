package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class HuffmanSpec extends AnyFunSuite {

  test("roundtrip on edges and seeded random inputs") {
    val rnd = new scala.util.Random(71)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      Array.fill(1000)(7.toByte), // single symbol
      "hello hello hello world".getBytes(UTF_8),
      Array.tabulate(256)(_.toByte),
      Array.fill(5000)(rnd.nextInt(256).toByte), // incompressible
      Array.fill(5000)(rnd.nextInt(4).toByte) // 2-bit entropy
    ) ++ (1 to 30).map(_ => Array.fill(rnd.nextInt(3000) + 1)(rnd.nextInt(rnd.nextInt(255) + 1).toByte))
    cases.foreach { data =>
      val rt = Huffman.decompress(Huffman.compress(data))
      assert(rt.sameElements(data), s"len ${data.length}")
    }
  }

  test("length cap: Fibonacci-skewed frequencies stay decodable (<= 15 bits)") {
    // Fibonacci frequencies force maximum code depth in an uncapped tree
    val fib = Iterator.iterate((1L, 1L)) { case (a, b) => (b, a + b) }.map(_._1).take(25).toSeq
    val data = fib.zipWithIndex.flatMap { case (f, sym) =>
      Seq.fill(math.min(f, 50000L).toInt)(sym.toByte)
    }.toArray
    val lens = {
      val freq = new Array[Long](256)
      fib.zipWithIndex.foreach { case (f, sym) => freq(sym) = f }
      Huffman.codeLengths(freq)
    }
    assert(lens.forall(_ <= Huffman.MaxLen), s"max len ${lens.max}")
    val rt = Huffman.decompress(Huffman.compress(data))
    assert(rt.sameElements(data))
  }

  test("compresses skewed codec streams, never hurts (wrapper is conditional)") {
    val rnd = new scala.util.Random(73)
    val words = "the of and to in data page web 2022".split(" ")
    val text = (1 to 400).map(_ => words(rnd.nextInt(words.length))).mkString(" ").getBytes(UTF_8)
    val mtfRle = Pipelines.bwtMtfRleEncode(text)
    val huf = Huffman.compress(mtfRle)
    assert(huf.length < mtfRle.length, s"huf ${huf.length} vs ${mtfRle.length}")
    // full pipeline picks the huffman tag when it wins and still roundtrips
    val enc = Pipelines.textEncode(text)
    assert(Pipelines.textDecode(enc).sameElements(text))
    assert(enc.length <= huf.length + 1)
  }

  test("compressWithSized is byte-identical to the byte-at-a-time bit writer model") {
    // model = the pre-round-3 writeByte-per-byte encoder
    def model(data: Array[Byte], lens: Array[Int]): Array[Byte] = {
      val codes = Huffman.canonicalCodes(lens)
      val buf = new Bytes.Buf(data.length / 2 + 140)
      buf.writeVarInt(data.length)
      var i = 0
      while (i < 256) { buf.writeByte((lens(i) & 0xF) | ((lens(i + 1) & 0xF) << 4)); i += 2 }
      var acc = 0L
      var nbits = 0
      i = 0
      while (i < data.length) {
        val s = data(i) & 0xFF
        acc = (acc << lens(s)) | codes(s)
        nbits += lens(s)
        while (nbits >= 8) { buf.writeByte(((acc >>> (nbits - 8)) & 0xFF).toInt); nbits -= 8 }
        i += 1
      }
      if (nbits > 0) buf.writeByte(((acc << (8 - nbits)) & 0xFF).toInt)
      buf.toArray
    }
    val rnd = new scala.util.Random(77)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](42),
      Array.fill(777)(3.toByte),
      Array.tabulate(256)(_.toByte)
    ) ++ (1 to 40).map(_ => Array.fill(rnd.nextInt(4000) + 1)(rnd.nextInt(rnd.nextInt(255) + 1).toByte))
    cases.foreach { data =>
      val freq = Huffman.histogram(data)
      val lens = Huffman.codeLengths(freq)
      val sized = Huffman.compressWithSized(data, lens,
        Huffman.compressedSize(freq, lens, data.length).toInt)
      assert(sized.sameElements(model(data, lens)), s"len ${data.length}")
      assert(Huffman.decompress(sized).sameElements(data), s"roundtrip len ${data.length}")
    }
  }

  test("decompressFirst peeks the inner codec id of wrapped payloads") {
    val vals = Array.fill(300)("alpha beta gamma".getBytes(UTF_8))
    val enc = ColumnCodec.encodeBinary(vals)
    val name = ColumnCodec.codecName(enc)
    // whatever was chosen, decode must roundtrip and the name must resolve
    assert(!name.contains("unknown"), name)
    val dec = ColumnCodec.decodeBinary(enc)
    vals.indices.foreach(i => assert(dec(i).sameElements(vals(i))))
  }
}
