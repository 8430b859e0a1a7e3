package graft.tools

/** Is the SA-IS per-doc cost allocation-bound? Times JUST the array
  * allocations a saisBytes call performs (level 0 + a typical recursion
  * level) against the measured whole-build time — decides whether a
  * workspace-reusing arena is worth building.
  */
object SaAllocProbe {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 2000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val perDoc = docs.map(_.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val bytes = perDoc.map(_.length.toLong).sum
    var sink = 0L

    def allocOnly(): Double = {
      val t0 = System.nanoTime()
      perDoc.foreach { d =>
        val n = d.length + 1
        val m = n / 3
        // level 0
        sink += new Array[Int](n)(0) // sa
        sink += (if (new Array[Boolean](n)(0)) 1 else 0) // isS
        sink += new Array[Int](257)(0) + new Array[Int](257)(0) +
          new Array[Int](257)(0) + new Array[Int](257)(0) // bktSize/bkt/start/end
        sink += new Array[Int](m max 1)(0) // lmsPos
        sink += new Array[Int](m max 1)(0) // sortedLms
        sink += new Array[Int](n)(0) // name
        sink += new Array[Int](m max 1)(0) // s1
        sink += new Array[Int](m max 1)(0) // out
        // one recursion level at n' = m
        val n2 = m max 1
        sink += new Array[Int](n2)(0)
        sink += (if (new Array[Boolean](n2)(0)) 1 else 0)
        sink += new Array[Int](n2)(0) // name at level 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    def buildAll(): Double = {
      val t0 = System.nanoTime()
      perDoc.foreach(d => sink += graft.codec.SuffixArrays.build(d)(0))
      (System.nanoTime() - t0) / 1e9
    }
    allocOnly(); buildAll() // warm
    (1 to 3).foreach { _ =>
      val a = allocOnly()
      val b = buildAll()
      println(f"alloc-only=$a%.3f s  whole-build=$b%.3f s  alloc share=${a / b * 100}%.1f%%" +
        f"  (build ${bytes / 1e6 / b}%.1f MB/s, sink=$sink)")
    }
  }
}
