package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

import graft.codec.{Bytes, Fsst, Huffman, Pipelines}
import graft.spark.PagesGen

/** VERDICT r04 task 7: `mapSidePreEncode` gives up the chunk-level FSST
  * option for text/html (each value is containerized per doc before the
  * exchange). Could FSST re-enter the pre-encode path — either a per-doc
  * symbol table (self-contained, like textEncode) or a shared table
  * sampled per input partition and carried forward? This probe measures
  * all the candidate policy points on the same generated web-text corpus:
  *
  *   bwt        = Pipelines.textEncode        (current default, bwtBias=1)
  *   huf        = Pipelines.textEncodeFast    (current speed-bias point)
  *   fsst_doc   = per-doc FSST table + body (table serialized per doc)
  *   fsst_part  = FSST table sampled once per 4096-doc slice, amortized
  *   fsst_p_huf = fsst_part with an order-0 Huffman pass over the body
  *
  * Keep-only-on-win rule: adopt a variant only if it beats an existing
  * point on ratio at >= equal throughput (or opens a clearly better
  * speed/ratio frontier point). Results are recorded in BENCH/BASELINE.md
  * either way, like the four SA restructuring negatives.
  *
  *   sbt -batch "runMain graft.tools.FsstPreAb 20000"
  */
object FsstPreAb {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 20000
    val docs: Array[Array[Byte]] = Array.tabulate(nDocs) { i =>
      val p = PagesGen.page(97L, i.toLong, 200, hostSkew = false)
      (if (p.text == null) "" else p.text).getBytes(UTF_8)
    }.filter(_.length > 0)
    val totalBytes = docs.map(_.length.toLong).sum
    println(f"FSST_AB docs=${docs.length} bytes=$totalBytes (${totalBytes / 1e6}%.1f MB)")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }
    def report(label: String, sec: Double, outBytes: Long): Unit =
      println(f"FSST_AB $label%-10s sec=$sec%7.2f mb_per_s=${totalBytes / 1e6 / sec}%7.1f " +
        f"ratio=${outBytes.toDouble / totalBytes}%.4f")

    // warm up JIT on a slice with the heaviest kernel
    docs.take(500).foreach(Pipelines.textEncode)

    val (bwtOut, bwtSec) = time(docs.map(d => Pipelines.textEncode(d).length.toLong).sum)
    report("bwt", bwtSec, bwtOut)

    val (hufOut, hufSec) = time(docs.map(d => Pipelines.textEncodeFast(d).length.toLong).sum)
    report("huf", hufSec, hufOut)

    // per-doc FSST: table built from (and serialized with) each doc
    val (fdOut, fdSec) = time(docs.map { d =>
      val t = Fsst.buildTable(Array(d))
      val buf = new Bytes.Buf(d.length / 2 + 64)
      Fsst.encodeValue(t, d, buf)
      (Fsst.serializeTable(t).length + buf.size).toLong
    }.sum)
    report("fsst_doc", fdSec, fdOut)

    // shared per-partition table: sample 64 docs per 4096-doc slice (the
    // narrow input-partition analogue), table cost amortized over the slice
    val (fpOut, fpSec) = time(docs.grouped(4096).map { slice =>
      val sample = slice.grouped(math.max(1, slice.length / 64)).map(_.head).toArray
      val t = Fsst.buildTable(sample)
      val table = Fsst.serializeTable(t).length.toLong
      table + slice.map { d =>
        val buf = new Bytes.Buf(d.length / 2 + 16)
        Fsst.encodeValue(t, d, buf)
        buf.size.toLong
      }.sum
    }.sum)
    report("fsst_part", fpSec, fpOut)

    // shared table + order-0 Huffman entropy pass over each body
    val (fhOut, fhSec) = time(docs.grouped(4096).map { slice =>
      val sample = slice.grouped(math.max(1, slice.length / 64)).map(_.head).toArray
      val t = Fsst.buildTable(sample)
      val table = Fsst.serializeTable(t).length.toLong
      table + slice.map { d =>
        val buf = new Bytes.Buf(d.length / 2 + 16)
        Fsst.encodeValue(t, d, buf)
        val body = buf.toArray
        val freq = Huffman.histogram(body)
        val lens = Huffman.codeLengths(freq)
        math.min(Huffman.compressedSize(freq, lens, body.length), body.length.toLong)
      }.sum
    }.sum)
    report("fsst_p_huf", fhSec, fhOut)
  }
}
