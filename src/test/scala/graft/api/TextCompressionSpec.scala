package graft.api

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.codec.{FixtureData, FmIndex}

/** The facade must reproduce the reference's public-API behavior (the
  * full wrapper lattice collapses here — mapping table in the Scaladoc).
  */
class TextCompressionSpec extends AnyFunSuite {

  test("bwtRle golden path: reference tokens of s1/s2 via the facade") {
    assert(TextCompression.referenceRleTokens(FixtureData.s1.getBytes(UTF_8)) == FixtureData.rle1)
    assert(TextCompression.referenceRleTokens(FixtureData.s2.getBytes(UTF_8)) == FixtureData.rle2)
  }

  test("compress/decompress pipelines roundtrip through the facade") {
    val samples = Seq("", "a", "ba", FixtureData.s1, FixtureData.s2, "naïve 中文 тест")
    samples.foreach { s =>
      assert(TextCompression.unbwtString(TextCompression.bwt(s)) == s)
      assert(TextCompression.unbwtRleString(TextCompression.bwtRle(s)) == s)
      assert(TextCompression.unbwtMtfString(TextCompression.bwtMtf(s)) == s)
      val raw = s.getBytes(UTF_8)
      assert(TextCompression.unrle(TextCompression.rle(raw)).sameElements(raw))
      assert(TextCompression.unmtf(TextCompression.mtf(raw)).sameElements(raw))
    }
  }

  test("direct MTF (no BWT, no sentinel): sorted-unique initial list, 0-based indices") {
    // "banana": alphabet [a,b,n]; b->1, a->1, n->2, a->1, n->1, a->1
    val m = TextCompression.mtf("banana".getBytes(UTF_8))
    assert(m.alphabet.map(_.toChar).toSeq == Seq('a', 'b', 'n'))
    assert(m.indices.toSeq == Seq(1, 1, 2, 1, 1, 1))
  }

  test("FM count/locate incl. S/P collapse and compat quirk") {
    val idx = TextCompression.fmIndex("abracadabra")
    assert(TextCompression.count(idx, "abra") == Some(2))
    assert(TextCompression.locate(idx, "abra").toSeq == Seq(8, 1))
    assert(TextCompression.countAll(idx, Seq("a", "bra", "zz")).map(_._2) ==
      Seq(Some(5), Some(2), None))
    assert(TextCompression.count(idx, "za", compat = true) == Some(5))
  }

  test("FM-index serialization roundtrip preserves search behavior") {
    val rnd = new scala.util.Random(67)
    (1 to 10).foreach { _ =>
      val text = Array.fill(rnd.nextInt(400) + 5)(('a' + rnd.nextInt(5)).toChar).mkString
      val idx = FmIndex.build(text.getBytes(UTF_8))
      val rt = FmIndex.deserialize(idx.serialize())
      (1 to 8).foreach { _ =>
        val pat = Array.fill(rnd.nextInt(4) + 1)(('a' + rnd.nextInt(5)).toChar).mkString
        assert(rt.count(pat.getBytes(UTF_8)) == idx.count(pat.getBytes(UTF_8)))
        assert(rt.locate(pat.getBytes(UTF_8)).toSeq == idx.locate(pat.getBytes(UTF_8)).toSeq)
      }
    }
  }

  test("multimodal content features are deterministic with the declared shape") {
    val bytes = "some media payload".getBytes(UTF_8)
    val e1 = graft.pipeline.Multimodal.contentEmbedding(bytes)
    val e2 = graft.pipeline.Multimodal.contentEmbedding(bytes)
    assert(e1.toSeq == e2.toSeq)
    assert(e1.length == graft.pipeline.Multimodal.EmbeddingDim)
    // non-media fallback: a normalized high-nibble histogram of the bytes
    assert(math.abs(e1.sum - 1.0f) < 1e-5f)
    assert(graft.pipeline.Multimodal.frameCount(0) == 1)
    assert(graft.pipeline.Multimodal.frameCount(4096) == 2)
  }
}
