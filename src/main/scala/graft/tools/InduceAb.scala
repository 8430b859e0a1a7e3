package graft.tools

import graft.codec.SuffixArrays

/** A/B: software-pipelined induce loops for the byte-level SA-IS kernel.
  *
  * The round-3 phase maps pin the induce passes at ~25% of the per-doc SA
  * cost, dominated by the random `sp(p-1)` load. This variant issues that
  * load D iterations ahead of use (ring buffer) so its latency overlaps
  * the sequential scan, with a staleness check at use time: a position
  * that was -1 at fetch time but filled by an intervening write inside
  * the lookahead window falls back to a direct load. Equivalence is
  * asserted against the production kernel on every input before timing.
  *
  * Run: `sbt "runMain graft.tools.InduceAb"`.
  */
object InduceAb {

  final val D = 12

  /** Copy of SuffixArrays.saisBytes with pipelined induce passes (recursion
    * still routes through the production kernel — only level-0 induces,
    * which carry ~2/3 of the induce cost on per-doc inputs, differ).
    */
  def saisBytesPipelined(t: Array[Byte]): Array[Int] = {
    val tn = t.length
    val n = tn + 1
    val k = 257
    val sa = new Array[Int](n)
    if (n == 1) { sa(0) = 0; return sa }
    if (n == 2) { sa(0) = 1; sa(1) = 0; return sa }

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

    def induceP(lms: Array[Int], mm: Int): Unit = {
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

      // induce L with a D-deep load pipeline: rp(q % D) caches (p, sp(p-1))
      // fetched at q' = q - D; stale entries (p changed since fetch) reload
      System.arraycopy(bktStart, 0, bkt, 0, k)
      val rp = new Array[Int](D)
      val rc = new Array[Int](D)
      var q = 0
      // prime the pipeline
      var f = 0
      while (f < D && f < n) {
        val p = sa(f)
        rp(f) = p
        rc(f) = if (p > 0) sp(p - 1) else 0
        f += 1
      }
      while (q < n) {
        // use the entry fetched D iterations ago, THEN refill the slot with
        // the fetch for q + D (same ring slot — must be consumed first)
        val p = sa(q)
        if (p > 0) {
          val slot = q % D
          val c = if (rp(slot) == p) rc(slot) else sp(p - 1)
          if ((c & 1) == 0) {
            sa(bkt(c >> 1)) = p - 1
            bkt(c >> 1) += 1
          }
        }
        val qd = q + D
        if (qd < n) {
          val pf = sa(qd)
          val slot = qd % D
          rp(slot) = pf
          rc(slot) = if (pf > 0) sp(pf - 1) else 0
        }
        q += 1
      }

      // induce S, mirrored
      System.arraycopy(bktEnd, 0, bkt, 0, k)
      q = n - 1
      f = 0
      while (f < D && n - 1 - f >= 0) {
        val idx = n - 1 - f
        val p = sa(idx)
        val slot = idx % D
        rp(slot) = p
        rc(slot) = if (p > 0) sp(p - 1) else 0
        f += 1
      }
      while (q >= 0) {
        val p = sa(q)
        if (p > 0) {
          val slot = q % D
          val c = if (rp(slot) == p) rc(slot) else sp(p - 1)
          if ((c & 1) == 1) {
            bkt(c >> 1) -= 1
            sa(bkt(c >> 1)) = p - 1
          }
        }
        val qd = q - D
        if (qd >= 0) {
          val pf = sa(qd)
          val slot = qd % D
          rp(slot) = pf
          rc(slot) = if (pf > 0) sp(pf - 1) else 0
        }
        q -= 1
      }
    }

    if (m == 0) { induceP(lmsPos, 0); return sa }
    induceP(lmsPos, m)

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

    val orderedLms =
      if (numNames == m) sortedLms
      else {
        // recursion through the production kernel (byte downcast included)
        val s1 = new Array[Byte](m)
        val sa1: Array[Int] =
          if (numNames <= 256) {
            var w2 = 0
            while (w2 < m) { s1(w2) = name(lmsPos(w2)).toByte; w2 += 1 }
            java.util.Arrays.copyOfRange(SuffixArrays.saisBytes(s1), 1, m + 1)
          } else {
            val s1i = new Array[Int](m)
            var w2 = 0
            while (w2 < m) { s1i(w2) = name(lmsPos(w2)); w2 += 1 }
            SuffixArrays.sais(s1i, numNames)
          }
        val out = new Array[Int](m)
        j = 0
        while (j < m) { out(j) = lmsPos(sa1(j)); j += 1 }
        out
      }

    induceP(orderedLms, m)
    sa
  }

  def main(args: Array[String]): Unit = {
    // equivalence sweep first: random, runs-heavy, and production-shaped
    val rnd = new scala.util.Random(7)
    def prodDoc(id: Long, tokens: Int): Array[Byte] = {
      val p = graft.spark.PagesGen.page(42L, id, 100, hostSkew = false)
      p.text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(tokens * 6)
    }
    val inputs: Seq[Array[Byte]] =
      (0 until 200).map(_ => Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)) ++
      (0 until 50).map(_ => Array.fill(rnd.nextInt(5000))((rnd.nextInt(3) + 'a').toByte)) ++
      (0L until 100L).map(prodDoc(_, 2000))
    inputs.foreach { in =>
      val a = SuffixArrays.build(in)
      val b = saisBytesPipelined(in)
      require(java.util.Arrays.equals(a, b), s"MISMATCH on n=${in.length}")
    }
    println(s"INDUCEAB equivalence ok on ${inputs.size} inputs")

    // timing: per-doc sizes and an MB-scale monolith
    def bytesOf(ids: Range): Array[Array[Byte]] = ids.map(i => prodDoc(i.toLong, 2000)).toArray
    val docs = bytesOf(0 until 300)
    val mono = {
      // a genuinely cache-exceeding input (the regime where hiding the
      // random sp(p-1) load latency could pay)
      val all = bytesOf(0 until 2500).flatten
      java.util.Arrays.copyOf(all, math.min(all.length, 10 << 20))
    }
    def time(reps: Int)(f: => Unit): Double = {
      var best = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    // warmup
    (1 to 3).foreach { _ => docs.foreach(SuffixArrays.build); docs.foreach(saisBytesPipelined) }
    val docBytes = docs.map(_.length.toLong).sum
    val tBase = time(7)(docs.foreach(SuffixArrays.build))
    val tPipe = time(7)(docs.foreach(saisBytesPipelined))
    val tBaseM = time(5)(SuffixArrays.build(mono))
    val tPipeM = time(5)(saisBytesPipelined(mono))
    println(f"INDUCEAB per-doc (${docBytes / 1e6}%.1f MB): base=$tBase%.3f s (${docBytes / 1e6 / tBase}%.1f MB/s)  pipelined=$tPipe%.3f s (${docBytes / 1e6 / tPipe}%.1f MB/s)")
    println(f"INDUCEAB monolith (${mono.length / 1e6}%.1f MB): base=$tBaseM%.3f s (${mono.length / 1e6 / tBaseM}%.1f MB/s)  pipelined=$tPipeM%.3f s (${mono.length / 1e6 / tPipeM}%.1f MB/s)")
  }
}
