package graft.tools

/** Instrumented copy of SuffixArrays.saisBytes: per-phase wall time for the
  * byte-specialized top level (fused scan / first induce / naming /
  * recursion / final induce) — decides where round-3 SA optimization
  * effort goes.
  */
object SaisBreakdown {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 2000L).map(i => graft.spark.PagesGen.page(42L, i, 100, hostSkew = false))
    val sb = new StringBuilder
    docs.foreach(d => sb.append(d.text))
    val t = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    println(s"input ${t.length / 1e6} MB")
    graft.codec.SuffixArrays.build(t) // warm
    (1 to 3).foreach(_ => run(t))
    // whole-build timing through the production dispatch
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val sa = graft.codec.SuffixArrays.build(t)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"build total=$sec%.3f (${t.length / 1e6 / sec}%.1f MB/s) sa0=${sa(0)}")
    }
    // production shape: per-doc inputs (~4-5 KB), phase totals summed
    val perDoc = docs.map(_.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    perDoc.take(300).foreach(d => runSilent(d)) // warm the small-input paths
    (1 to 3).foreach { _ =>
      val acc = new Array[Double](5)
      var bytes = 0L
      perDoc.foreach { d => runInto(d, acc); bytes += d.length }
      val tot = acc.sum
      println(f"per-doc  scan=${acc(0)}%.3f induce1=${acc(1)}%.3f name=${acc(2)}%.3f" +
        f" rec=${acc(3)}%.3f induce2=${acc(4)}%.3f total=$tot%.3f (${bytes / 1e6 / tot}%.1f MB/s)")
    }
  }

  private def runSilent(t: Array[Byte]): Unit = runInto(t, new Array[Double](5))

  def run(t: Array[Byte]): Unit = {
    val acc = new Array[Double](5)
    val (m, numNames) = runInto(t, acc)
    val total = acc.sum
    println(f"m=$m names=$numNames scan=${acc(0)}%.3f induce1=${acc(1)}%.3f name=${acc(2)}%.3f" +
      f" rec=${acc(3)}%.3f induce2=${acc(4)}%.3f total=$total%.3f (${t.length / 1e6 / total}%.1f MB/s)")
  }

  /** Phase times added into acc(0..4); returns (m, numNames).
    * Mirror of the CURRENT production saisBytes (packed Short codes, fused
    * backward scan, length-first naming, name gather from lmsPos) — keep in
    * sync with SuffixArrays.scala when the production kernel changes.
    */
  def runInto(t: Array[Byte], acc: Array[Double]): (Int, Int) = {
    val tn = t.length
    val n = tn + 1
    val k = 257
    val sa = new Array[Int](n)

    var t0 = System.nanoTime()
    val sp = new Array[Short](n)
    val bktSize = new Array[Int](k)
    sp(n - 1) = 1
    bktSize(0) = 1
    var m = 0
    var i = n - 2
    var sj = 0
    var sjS = true
    while (i >= 0) {
      val si = (t(i) & 0xFF) + 1
      bktSize(si) += 1
      val s = si < sj || (si == sj && sjS)
      sp(i) = ((si << 1) | (if (s) 1 else 0)).toShort
      if (!s && sjS) { m += 1; sa(n - m) = i + 1 }
      sj = si
      sjS = s
      i -= 1
    }
    val bkt = new Array[Int](k)
    val lmsPos = new Array[Int](m)
    i = 0
    while (i < m) { lmsPos(i) = sa(n - m + i); i += 1 }
    val bktStart = new Array[Int](k)
    val bktEnd = new Array[Int](k)
    var sum0 = 0
    var c0 = 0
    while (c0 < k) { bktStart(c0) = sum0; sum0 += bktSize(c0); bktEnd(c0) = sum0; c0 += 1 }
    acc(0) += (System.nanoTime() - t0) / 1e9

    def induceB(lms: Array[Int], mm: Int): Unit = {
      java.util.Arrays.fill(sa, -1)
      System.arraycopy(bktEnd, 0, bkt, 0, k)
      var j = mm - 1
      while (j >= 0) {
        val p = lms(j)
        val ch = sp(p) >> 1
        bkt(ch) -= 1
        sa(bkt(ch)) = p
        j -= 1
      }
      System.arraycopy(bktStart, 0, bkt, 0, k)
      var q = 0
      while (q < n) {
        val p = sa(q)
        if (p > 0) {
          val c = sp(p - 1)
          if ((c & 1) == 0) { sa(bkt(c >> 1)) = p - 1; bkt(c >> 1) += 1 }
        }
        q += 1
      }
      System.arraycopy(bktEnd, 0, bkt, 0, k)
      q = n - 1
      while (q >= 0) {
        val p = sa(q)
        if (p > 0) {
          val c = sp(p - 1)
          if ((c & 1) == 1) { bkt(c >> 1) -= 1; sa(bkt(c >> 1)) = p - 1 }
        }
        q -= 1
      }
    }

    t0 = System.nanoTime()
    induceB(lmsPos, m)
    acc(1) += (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val sortedLms = new Array[Int](m)
    var w = 0
    i = 0
    while (i < n) {
      val p = sa(i)
      if (p > 0 && (sp(p) & 1) == 1 && (sp(p - 1) & 1) == 0) { sortedLms(w) = p; w += 1 }
      i += 1
    }
    val lenByPos = new Array[Int](n)
    i = 0
    while (i < m - 1) { lenByPos(lmsPos(i)) = lmsPos(i + 1) - lmsPos(i) + 1; i += 1 }
    lenByPos(n - 1) = 1
    val name = new Array[Int](n)
    var curName = 0
    name(sortedLms(0)) = 0
    var prev = sortedLms(0)
    var j = 1
    while (j < m) {
      val cur = sortedLms(j)
      var eq = false
      val lc = lenByPos(cur)
      if (lenByPos(prev) == lc) {
        var x = 0
        while (x < lc && sp(prev + x) == sp(cur + x)) x += 1
        eq = x == lc
      }
      if (!eq) curName += 1
      name(cur) = curName
      prev = cur
      j += 1
    }
    val numNames = curName + 1
    acc(2) += (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val orderedLms =
      if (numNames == m) sortedLms
      else {
        val s1 = new Array[Int](m)
        w = 0
        while (w < m) { s1(w) = name(lmsPos(w)); w += 1 }
        val sa1 = graft.codec.SuffixArrays.sais(s1, numNames)
        val out = new Array[Int](m)
        j = 0
        while (j < m) { out(j) = lmsPos(sa1(j)); j += 1 }
        out
      }
    acc(3) += (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    induceB(orderedLms, m)
    acc(4) += (System.nanoTime() - t0) / 1e9
    if (sa(0) != tn) throw new IllegalStateException("bad SA")
    (m, numNames)
  }
}
