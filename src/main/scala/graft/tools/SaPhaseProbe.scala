package graft.tools

/** Instrumented copy of the SA-IS top level to see phase costs. */
object SaPhaseProbe {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 2000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val sb = new StringBuilder
    docs.foreach(d => sb.append(d.text))
    val t = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = t.length
    println(s"input ${n / 1e6} MB")

    // warm
    graft.codec.SuffixArrays.build(t)

    (1 to 3).foreach { _ =>
      var t0 = System.nanoTime()
      val s = new Array[Int](n + 1)
      var i = 0
      while (i < n) { s(i) = (t(i) & 0xFF) + 1; i += 1 }
      s(n) = 0
      val tConv = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val sa = graft.codec.SuffixArrays.sais(s, 257)
      val tSais = (System.nanoTime() - t0) / 1e9
      println(f"convert=$tConv%.3f sais=$tSais%.3f total_mbps=${n / 1e6 / (tConv + tSais)}%.1f  sa0=${sa(0)}")
    }
  }
}
