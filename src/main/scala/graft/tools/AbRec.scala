package graft.tools

/** A/B of the two recursion implementations on identical reduced-string-
  * shaped inputs (alphabet k, unique trailing 0): byte-level downcast vs
  * generic int path. Measured: equal at per-doc sizes (n <= 30k, within
  * 3%), byte path 7-11% faster at n = 300k-2M (Short packed codes halve
  * the sp traffic once the working set leaves L2) — the basis for the
  * numNames <= 256 downcast in SuffixArrays.recurseOnNames.
  */
object AbRec {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1500, 30000, 300000, 2000000); k <- Seq(47, 200)) {
      // reduced-string-shaped input: length n, alphabet k, trailing unique 0
      val b = new Array[Byte](n)
      var i = 0
      while (i < n - 1) { b(i) = (rnd.nextInt(k - 1) + 1).toByte; i += 1 }
      b(n - 1) = 0
      val s = new Array[Int](n)
      i = 0; while (i < n) { s(i) = (b(i) & 0xFF) + 1; i += 1 }
      // warmup
      graft.codec.SuffixArrays.saisBytes(b); graft.codec.SuffixArrays.sais(s.clone(), 257)
      var tb = Double.MaxValue; var tg = Double.MaxValue
      (1 to 5).foreach { _ =>
        var t0 = System.nanoTime()
        graft.codec.SuffixArrays.saisBytes(b)
        tb = math.min(tb, (System.nanoTime() - t0) / 1e9)
        t0 = System.nanoTime()
        graft.codec.SuffixArrays.sais(s.clone(), 257)
        tg = math.min(tg, (System.nanoTime() - t0) / 1e9)
      }
      println(f"n=$n%8d k=$k%4d  bytes=${tb * 1e3}%8.2f ms  generic=${tg * 1e3}%8.2f ms  ratio=${tg / tb}%5.2f")
    }
  }
}
