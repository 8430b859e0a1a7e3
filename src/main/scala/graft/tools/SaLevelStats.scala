package graft.tools

/** Recursion-level structure of SA-IS on production-shape inputs: per
  * level, the reduced-string length m, distinct names, and whether the
  * level recursed again. Tells round-4 whether the measured 47% recursion
  * share is one level-1 pass (per-element overhead of the generic int
  * path) or a deep chain (inherent repetitive-input work).
  */
object SaLevelStats {
  final case class Lvl(n: Int, m: Int, names: Int)

  /** Minimal SA-IS scaffold that only computes the level chain. */
  def levels(s: Array[Int], k: Int, acc: List[Lvl]): List[Lvl] = {
    val n = s.length
    if (n <= 2) return acc
    val isS = new Array[Boolean](n)
    isS(n - 1) = true
    var i = n - 2
    while (i >= 0) {
      isS(i) = s(i) < s(i + 1) || (s(i) == s(i + 1) && isS(i + 1))
      i -= 1
    }
    val lms = (1 until n).filter(p => isS(p) && !isS(p - 1)).toArray
    if (lms.length == 0) return Lvl(n, 0, 0) :: acc
    // order LMS substrings correctly via the real implementation
    val sa = graft.codec.SuffixArrays.sais(s.clone(), k)
    val isLms = new Array[Boolean](n)
    lms.foreach(p => isLms(p) = true)
    val sorted = sa.filter(p => p > 0 && isLms(p))
    // name by substring equality (lengths from adjacent LMS in text order)
    val nextLms = new Array[Int](n)
    var last = n - 1
    i = lms.length - 1
    while (i >= 0) { nextLms(lms(i)) = if (i + 1 < lms.length) lms(i + 1) else n - 1; i -= 1 }
    def eq(a: Int, b: Int): Boolean = {
      val la = nextLms(a) - a
      val lb = nextLms(b) - b
      if (la != lb) return false
      var x = 0
      while (x <= la) {
        if (s(a + x) != s(b + x) || isS(a + x) != isS(b + x)) return false
        x += 1
      }
      true
    }
    val nameOf = new Array[Int](n)
    var cur = 0
    nameOf(sorted(0)) = 0
    i = 1
    while (i < sorted.length) {
      if (!eq(sorted(i - 1), sorted(i))) cur += 1
      nameOf(sorted(i)) = cur
      i += 1
    }
    val names = cur + 1
    val lvl = Lvl(n, lms.length, names)
    if (names == lms.length) lvl :: acc
    else levels(lms.map(nameOf), names, lvl :: acc)
  }

  def main(args: Array[String]): Unit = {
    val docs = (0L until 300L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val agg = scala.collection.mutable.Map.empty[Int, (Long, Long, Long, Long)] // depth -> (count, sumN, sumM, sumNames)
    docs.foreach { d =>
      val t = d.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val s = new Array[Int](t.length + 1)
      var i = 0
      while (i < t.length) { s(i) = (t(i) & 0xFF) + 1; i += 1 }
      val chain = levels(s, 257, Nil).reverse
      chain.zipWithIndex.foreach { case (l, depth) =>
        val (c, sn, sm, snm) = agg.getOrElse(depth, (0L, 0L, 0L, 0L))
        agg(depth) = (c + 1, sn + l.n, sm + l.m, snm + l.names)
      }
    }
    println("depth  docs  avg_n  avg_m  avg_names  m/n  names/m")
    agg.toSeq.sortBy(_._1).foreach { case (d, (c, sn, sm, snm)) =>
      println(f"$d%5d $c%5d ${sn / c}%6d ${sm / c}%6d ${snm / c}%9d ${sm.toDouble / sn}%5.2f ${snm.toDouble / math.max(sm, 1)}%7.2f")
    }
  }
}
