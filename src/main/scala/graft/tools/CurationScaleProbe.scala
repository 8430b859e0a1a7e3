package graft.tools

/** Two-parallelism scaling probe for the wave-2 curation operators
  * (dup-span coverage, decontamination, repetition stats, stratified
  * sampling) on a corpus big enough that job overhead stops dominating:
  * deterministic word-salad docs (~220 tokens) with 5% of ids collapsed
  * onto their 4000-block head's text (200-way exact-duplicate clusters —
  * the dup-span and contamination signals), bench split id % 997.
  *
  * Levels follow the house scaling methodology (BENCH/BASELINE.md
  * §scaling): the matched-per-core-volume pair — local[4] on n/4 docs vs
  * local[16] on n docs, eff = t_4 / t_16 — isolates the plan from the
  * host's total-volume memory-channel ceiling; the same-input 8 -> 32
  * pair is also printed for the ceiling record. Results recorded in
  * BENCH/BASELINE.md.
  */
object CurationScaleProbe {

  private def docFor(g: Long, tokens: Int): String = {
    val sb = new StringBuilder(tokens * 6)
    var z = g * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
    var i = 0
    while (i < tokens) {
      z ^= z << 13; z ^= z >>> 7; z ^= z << 17 // xorshift64 (public domain)
      if (i > 0) sb.append(' ')
      sb.append("w").append(java.lang.Long.toUnsignedString(z % 2500))
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val tokens = 220
    def settle(): Unit = {
      // the host's post-JVM reclaim pollutes the NEXT level (documented
      // drift); wait for loadavg to drop before timing anything
      val deadline = System.nanoTime() + 180L * 1000000000L
      var load = 99.0
      while (load > 3.5 && System.nanoTime() < deadline) {
        Thread.sleep(5000)
        load = graft.Bench.loadavg()
      }
      println(f"CURPROBE settle loadavg=$load%.2f")
    }
    // SPARK_CUR_LEVELS="16:400000,32:400000" overrides the level list
    // (investigation / re-measurement without re-running the whole grid)
    val levels = sys.env.get("SPARK_CUR_LEVELS") match {
      case Some(s) => s.split(',').toSeq.map { p =>
        val Array(c, d) = p.split(':'); (c.toInt, d.toLong)
      }
      case None => Seq((4, n / 4), (16, n), (8, n), (32, n))
    }
    levels.foreach { case (cpus, nDocs) =>
      settle()
      val spark = graft.Bench.newSession(cpus.toString)
      import spark.implicits._
      val docs = spark.createDataset(
        spark.range(0L, nDocs, 1L, 128).rdd.map { jid =>
          val id = jid.toLong
          val g = if (id % 20 == 0) (id / 4000) * 4000 else id
          (id, docFor(g, tokens))
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val bytes = docs.map(_._2.length.toLong).reduce(_ + _) // forces materialization
      val mb = bytes / 1e6

      def time(op: String)(body: => Long): Unit = {
        body // warm pass: JIT + first-touch page faults + shuffle-dir init
        val t0 = System.nanoTime()
        val out = body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"CURPROBE cpus=$cpus op=$op sec=$sec%.2f mb_per_sec=${mb / sec}%.1f out=$out")
      }
      import org.apache.spark.sql.functions._
      time("dup_spans") {
        graft.pipeline.Dedup.dupSpanCoverage(spark, docs)
          .filter(col("dup_windows") > 0).count()
      }
      time("decontaminate") {
        // hashGrams = the scale form (8-byte broadcast entries, no gram
        // strings on the training side)
        graft.pipeline.Dedup.decontaminate(spark,
            docs.filter(_._1 % 997 != 0), docs.filter(_._1 % 997 == 0),
            hashGrams = true)
          .filter(col("contaminated")).count()
      }
      time("repetition") {
        graft.pipeline.TextAnalysis.repetitionStats(spark, docs)
          .agg(sum("distinct_bigrams")).first().getLong(0)
      }
      time("sample") {
        graft.pipeline.Sampling.stratifiedSample(spark,
          docs.map { case (id, t) => (id, if (id % 3 == 0) "en" else "xx") },
          rates = Map("en" -> ((1, 2))), defaultRate = (1, 4), salt = 1L).count()
      }
      spark.stop()
    }
  }
}
