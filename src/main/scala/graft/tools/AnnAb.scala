package graft.tools

import org.apache.spark.sql.functions._

/** A/B: per-batch cost of the in-memory ANN operators (which re-scan the
  * corpus every query batch) vs the stored index tables (AnnIndexJob).
  * Backs the BENCH/BASELINE.md routing claim that repeated search belongs
  * on the stored path. Run: `sbt "runMain graft.tools.AnnAb [sfDir]"`.
  */
object AnnAb {
  def main(args: Array[String]): Unit = {
    // arg: an sf dir (harness embeddings) or an integer N (deterministic
    // synthetic corpus of N 32-dim vectors — the harness embeddings table
    // is 2000 rows at every SF, too small to show the asymptotic regime)
    val arg = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.newSession("32")
    import spark.implicits._
    val vecs: org.apache.spark.sql.Dataset[(Long, Array[Float])] = arg.toLongOption match {
      case Some(nSynth) =>
        // materialize to parquet first: the in-memory operators' per-batch
        // corpus pass must pay the same table-read cost it would in a real
        // deployment (a regenerating narrow map would hide the IO the
        // stored index exists to prune)
        val dir = s"/root/repo/target/ab_ann_corpus_$nSynth"
        if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
          graft.Bench.deleteDir(dir)
          spark.range(0, nSynth, 1, 32).map { id =>
            val v = Array.tabulate(32) { d =>
              var z = id * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
              z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
              ((z >> 40).toFloat / (1 << 23))
            }
            (id: Long, v)
          }.toDF("vec_id", "embedding").write.parquet(dir)
        }
        spark.read.parquet(dir).select($"vec_id", $"embedding").as[(Long, Array[Float])]
      case None =>
        spark.read.parquet(s"$arg/embeddings.parquet")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])]
    }
    val n = vecs.count()
    val qids = Seq(0L, 1L, 2L, 3L, 4L)

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def best(reps: Int)(f: => Long): Double =
      (1 to reps).map(_ => time(f)._1).min

    val ivfDir = "/root/repo/target/ab_ann_ivf"
    val rhpDir = "/root/repo/target/ab_ann_rhp"
    graft.Bench.deleteDir(ivfDir)
    graft.Bench.deleteDir(rhpDir)

    val (ivfBuild, _) = time(graft.pipeline.AnnIndexJob.buildIvf(spark, vecs, ivfDir, nLists = 32))
    val (rhpBuild, _) = time(graft.pipeline.AnnIndexJob.buildRhp(spark, vecs, rhpDir, bands = 4, bitsPerBand = 8))

    val reps = 5
    val ivfMem = best(reps)(
      graft.pipeline.Similarity.ivfTopK(spark, vecs, qids, 5, nLists = 32, nProbe = 4).count())
    val ivfStored = best(reps)(
      graft.pipeline.AnnIndexJob.searchIvf(spark, ivfDir, qids, 5, nProbe = 4).count())
    val lshMem = best(reps)(
      graft.pipeline.Similarity.lshTopK(spark, vecs, qids, 5, bands = 4, bitsPerBand = 8, multiProbe = 1).count())
    val rhpStored = best(reps)(
      graft.pipeline.AnnIndexJob.searchRhp(spark, rhpDir, qids, 5, multiProbe = 1).count())

    println(f"ANNAB n=$n%d reps=$reps (best-of) qids=${qids.size}%d")
    println(f"ANNAB ivf  build=$ivfBuild%.3f s  per-batch in-memory=$ivfMem%.3f s  stored=$ivfStored%.3f s")
    println(f"ANNAB rhp  build=$rhpBuild%.3f s  per-batch in-memory=$lshMem%.3f s  stored=$rhpStored%.3f s")
    spark.stop()
  }
}
