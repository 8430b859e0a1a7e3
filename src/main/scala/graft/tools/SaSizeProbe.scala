package graft.tools

object SaSizeProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(5)
    def doc(n: Int): Array[Byte] = {
      // web-text-like: words from a small vocab
      val sb = new StringBuilder
      while (sb.length < n) { sb.append("w" + rnd.nextInt(1000)).append(' ') }
      sb.toString.take(n).getBytes("UTF-8")
    }
    Seq(1024, 4096, 16384, 65536, 262144, 1048576).foreach { n =>
      val docs = Array.fill(math.max(1, (4 << 20) / n))(doc(n))
      docs.foreach(graft.codec.SuffixArrays.build) // warmup
      val t0 = System.nanoTime()
      docs.foreach(graft.codec.SuffixArrays.build)
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = docs.map(_.length.toLong).sum / 1e6
      println(f"n=$n%8d  ${mb / sec}%8.1f MB/s")
    }
  }
}
