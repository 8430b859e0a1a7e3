package graft.tools

/** Decode-kernel phase costs on the standard corpus: huffman / mtf+rle
  * parse / inverse BWT.
  */
object DecodePhases {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 1000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val texts = docs.map(_.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val total = texts.map(_.length.toLong).sum
    val encoded = texts.map(graft.codec.Pipelines.textEncode)
    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      println(f"$name%-22s ${total / 1e6 / ((System.nanoTime() - t0) / 1e9)}%8.1f MB/s(raw)")
    }
    time("textDecode_full") { encoded.foreach(graft.codec.Pipelines.textDecode) }
    // decompose: most payloads are tag 3 = huffman(mtfRle)
    val tag3 = encoded.filter(_(0) == 3).map(p => java.util.Arrays.copyOfRange(p, 1, p.length))
    println(s"tag3 payloads: ${tag3.length} of ${encoded.length}")
    time("huffman_decompress") { tag3.foreach(graft.codec.Huffman.decompress) }
    val streams = tag3.map(graft.codec.Huffman.decompress)
    val bwts = texts.map(graft.codec.BwtCodec.encode)
    time("inverse_bwt_only") { bwts.foreach(graft.codec.BwtCodec.decode) }
    val mtfChunks = bwts.map(graft.codec.MtfCodec.encode)
    time("mtf_decode_only") { mtfChunks.foreach(graft.codec.MtfCodec.decode) }
  }
}
