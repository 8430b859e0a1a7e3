package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

/** Single-threaded kernel microbenchmark: where does encode time go? */
object TimeKernels {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 500L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val texts = docs.map(_.text.getBytes(UTF_8)).toArray
    val htmls = docs.map(_.html).toArray
    val totalBytes = texts.map(_.length).sum + htmls.map(_.length).sum

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${totalBytes / 1e6 / sec}%8.1f MB/s  (${sec}%.3f s for ${totalBytes / 1e6}%.1f MB)")
    }

    def timeOne(name: String, data: Array[Array[Byte]])(f: Array[Byte] => Unit): Unit = {
      data.foreach(f) // warmup
      val bytes = data.map(_.length).sum
      val t0 = System.nanoTime()
      data.foreach(f)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${bytes / 1e6 / sec}%8.1f MB/s  (${sec}%.3f s for ${bytes / 1e6}%.1f MB)")
    }

    val all = texts ++ htmls
    timeOne("sa_only", all)(t => graft.codec.SuffixArrays.build(t))
    timeOne("bwt_encode", all)(t => graft.codec.BwtCodec.encode(t))
    timeOne("bwt_roundtrip", all)(t => graft.codec.BwtCodec.decode(graft.codec.BwtCodec.encode(t)))
    timeOne("mtf_after_bwt", all) { t =>
      graft.codec.MtfCodec.encode(graft.codec.BwtCodec.encode(t))
    }
    timeOne("textEncode_full", all)(t => graft.codec.Pipelines.textEncode(t))
    timeOne("fsst_column_500vals", Array(Array.emptyByteArray)) { _ =>
      graft.codec.ColumnCodec.encodeFsst(texts)
    }
    time("encodeBinary_text_column") { graft.codec.ColumnCodec.encodeBinary(texts) }
    time("encodeBinary_html_column") { graft.codec.ColumnCodec.encodeBinary(htmls) }
  }
}
