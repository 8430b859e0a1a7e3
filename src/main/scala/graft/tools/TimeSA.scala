package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

object TimeSA {
  def main(args: Array[String]): Unit = {
    // one large doc vs many small docs: per-call overhead or per-byte cost?
    val docs = (0L until 2000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val small = docs.map(_.text.getBytes(UTF_8)).toArray
    val big = {
      val sb = new StringBuilder
      docs.foreach(d => sb.append(d.text))
      sb.toString.getBytes(UTF_8)
    }
    def mbps(bytes: Long, sec: Double) = bytes / 1e6 / sec
    // warm
    small.take(200).foreach(graft.codec.SuffixArrays.build)
    graft.codec.SuffixArrays.build(big)
    var t0 = System.nanoTime()
    small.foreach(graft.codec.SuffixArrays.build)
    val secSmall = (System.nanoTime() - t0) / 1e9
    println(f"small docs (${small.length}): ${mbps(small.map(_.length.toLong).sum, secSmall)}%.1f MB/s")
    t0 = System.nanoTime()
    graft.codec.SuffixArrays.build(big)
    val secBig = (System.nanoTime() - t0) / 1e9
    println(f"one big doc (${big.length / 1e6}%.1f MB): ${mbps(big.length, secBig)}%.1f MB/s")
  }
}
