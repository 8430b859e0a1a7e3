package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import graft.codec._

/** Phase split of the single-thread `Pipelines.textEncode` tail: after the
  * SA build, where do the remaining ~45% of cycles go? Decides whether
  * round-3 perf effort targets the RLE/MTF/Huffman tail or deeper SA work.
  */
object TextEncodePhases {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 1000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val all = (docs.map(_.text.getBytes(UTF_8)) ++ docs.map(_.html)).toArray
    val bytes = all.map(_.length.toLong).sum

    def time(name: String, reps: Int = 3)(f: => Long): Unit = {
      f // warmup
      var best = Double.MaxValue
      var sink = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        sink ^= f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-26s ${bytes / 1e6 / best}%8.1f MB/s  ($best%.3f s, sink=${sink & 1})")
    }

    // pre-compute BWTs + MTF chunks once so tail phases are isolated
    val bwts = all.map(BwtCodec.encode)
    val mtfs = bwts.map(MtfCodec.encode)
    val mtfRle = mtfs.map(Pipelines.mtfRleSerialize)

    time("sa+bwt")(all.map(BwtCodec.encode(_).sentinelPos.toLong).sum)
    time("mtf_encode")(bwts.map(MtfCodec.encode(_).indices.length.toLong).sum)
    time("mtfrle_serialize")(mtfs.map(Pipelines.mtfRleSerialize(_).length.toLong).sum)
    time("rle_encode+serialize") {
      bwts.map(b => RleCodec.serialize(RleCodec.encode(b)).length.toLong).sum
    }
    time("huffman_hist+lens") {
      mtfRle.map { a =>
        val freq = Huffman.histogram(a)
        val lens = Huffman.codeLengths(freq)
        Huffman.compressedSize(freq, lens, a.length)
      }.sum
    }
    time("mtfrle_fused")(bwts.map(Pipelines.mtfRleEncodeFused(_).length.toLong).sum)
    time("rle_cost_only")(bwts.map(Pipelines.rleSerializedCost(_).toLong).sum)
    time("huffman_sized") {
      mtfRle.map { a =>
        val freq = Huffman.histogram(a)
        val lens = Huffman.codeLengths(freq)
        Huffman.compressWithSized(a, lens, Huffman.compressedSize(freq, lens, a.length).toInt).length.toLong
      }.sum
    }
    time("textEncode_full")(all.map(Pipelines.textEncode(_).length.toLong).sum)
  }
}
