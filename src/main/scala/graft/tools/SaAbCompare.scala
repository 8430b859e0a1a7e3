package graft.tools

/** In-JVM alternating A/B of the packed-type SA-IS (SuffixArrays.build)
  * vs the round-2 shape (SaisBreakdown.runInto is a faithful copy of it):
  * same process, interleaved batches, so host-level noise cancels.
  */
object SaAbCompare {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 2000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val perDoc = docs.map(_.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val bytes = perDoc.map(_.length.toLong).sum
    var sink = 0L
    val acc = new Array[Double](5)
    def oldRun(): Double = {
      val t0 = System.nanoTime()
      perDoc.foreach(d => sink += SaisBreakdown.runInto(d, acc)._1)
      (System.nanoTime() - t0) / 1e9
    }
    def newRun(): Double = {
      val t0 = System.nanoTime()
      perDoc.foreach(d => sink += graft.codec.SuffixArrays.build(d)(0))
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    (1 to 2).foreach { _ => oldRun(); newRun() }
    val olds = scala.collection.mutable.ArrayBuffer[Double]()
    val news = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 5).foreach { _ => olds += oldRun(); news += newRun() }
    def mbps(s: Double) = bytes / 1e6 / s
    println(f"OLD best=${mbps(olds.min)}%.1f median=${mbps(olds.sorted.apply(2))}%.1f MB/s  runs=${olds.map(s => f"${mbps(s)}%.1f").mkString(",")}")
    println(f"NEW best=${mbps(news.min)}%.1f median=${mbps(news.sorted.apply(2))}%.1f MB/s  runs=${news.map(s => f"${mbps(s)}%.1f").mkString(",")}")
    println(s"sink=$sink")
  }
}
