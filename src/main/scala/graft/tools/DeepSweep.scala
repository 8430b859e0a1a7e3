package graft.tools

import graft.codec._

/** One-off deep equivalence sweep for the round-3 fused kernels: thousands
  * of random + pathological inputs, fused paths vs unfused models vs naive
  * SA. Exits non-zero on the first divergence.
  */
object DeepSweep {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(20260817L)
    def randInput(maxLen: Int): Array[Byte] = {
      val n = rnd.nextInt(maxLen) + 1
      rnd.nextInt(6) match {
        case 0 => Array.fill(n)(rnd.nextInt(256).toByte) // full alphabet
        case 1 => Array.fill(n)(rnd.nextInt(2).toByte) // binary
        case 2 => Array.fill(n)(7.toByte) // constant
        case 3 => // periodic
          val p = rnd.nextInt(8) + 1
          Array.tabulate(n)(i => (i % p).toByte)
        case 4 => // text-like
          val words = Array("the", "cat", "sat", "on", "mat", "über", "naïve", "data ")
          val sb = new StringBuilder
          while (sb.length < n) sb.append(words(rnd.nextInt(words.length))).append(' ')
          sb.toString.take(n).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case _ => // runs of runs
          val sb = new scala.collection.mutable.ArrayBuffer[Byte]()
          while (sb.length < n) {
            val b = rnd.nextInt(4).toByte
            (0 until rnd.nextInt(50) + 1).foreach(_ => sb += b)
          }
          sb.take(n).toArray
      }
    }

    var checked = 0
    def fail(msg: String): Nothing = { System.err.println(s"DEEPSWEEP FAIL after $checked: $msg"); sys.exit(1) }

    // 1. SA vs naive on small inputs (naive is O(n^2 log n))
    (1 to 3000).foreach { _ =>
      val t = randInput(600)
      if (!SuffixArrays.build(t).sameElements(SuffixArrays.buildNaive(t))) fail(s"SA naive mismatch len=${t.length}")
      checked += 1
    }
    println(s"DEEPSWEEP sa_vs_naive ok ($checked)")

    // 2. SA byte level vs generic int level on medium inputs
    (1 to 500).foreach { _ =>
      val t = randInput(20000)
      if (!SuffixArrays.build(t).sameElements(SuffixArrays.buildGeneric(t))) fail(s"SA generic mismatch len=${t.length}")
      checked += 1
    }
    println("DEEPSWEEP sa_vs_generic ok")

    // 3. fused encode/decode paths vs unfused models + roundtrip, larger inputs
    (1 to 2000).foreach { _ =>
      val t = randInput(50000)
      val bwt = BwtCodec.encode(t)
      val fusedA = Pipelines.mtfRleEncodeFused(bwt)
      val modelA = Pipelines.mtfRleSerialize(MtfCodec.encode(bwt))
      if (!fusedA.sameElements(modelA)) fail(s"mtfRle fused mismatch len=${t.length}")
      if (Pipelines.rleSerializedCost(bwt) != RleCodec.serialize(RleCodec.encode(bwt)).length)
        fail(s"rle cost mismatch len=${t.length}")
      val back = Pipelines.mtfRleDecodeFusedToBwt(fusedA)
      if (back != bwt) fail(s"fused decode mismatch len=${t.length}")
      val enc = Pipelines.textEncode(t)
      if (!Pipelines.textDecode(enc).sameElements(t)) fail(s"textEncode roundtrip len=${t.length}")
      val encFast = Pipelines.textEncodeFast(t)
      if (!Pipelines.textDecode(encFast).sameElements(t)) fail(s"textEncodeFast roundtrip len=${t.length}")
      val freq = Huffman.histogram(t)
      val lens = Huffman.codeLengths(freq)
      val sized = Huffman.compressWithSized(t, lens, Huffman.compressedSize(freq, lens, t.length).toInt)
      if (!Huffman.decompress(sized).sameElements(t)) fail(s"huffman roundtrip len=${t.length}")
      checked += 1
    }
    println(s"DEEPSWEEP fused_paths ok (total $checked inputs)")
  }
}
