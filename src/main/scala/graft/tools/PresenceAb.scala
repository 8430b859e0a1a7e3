package graft.tools

import org.apache.spark.sql.functions._

/** A/B the presence-check join shapes on one stored table: the explicit
  * part_id EQUI-key form (shipped) vs the former folded predicate
  * `d_part IS NULL OR part_id = d_part`. MEASURED RESULT: parity (0.91-
  * 1.62x across shapes/scales, i.e. noise) — Catalyst constant-folds the
  * isNull off the folded form because d_part's Int schema is non-nullable,
  * so BOTH shapes plan the same broadcast hash join on meta tables. The
  * shipped split is therefore a CONTRACT fix, not a speedup: it makes the
  * equi-key independent of nullability inference (spec-pinned) instead of
  * schema-incidental. Recorded in BENCH/BASELINE.md as a negative A/B.
  *
  * Usage: runMain graft.tools.PresenceAb [nPages] [nTargets] [chunkRows]
  */
object PresenceAb {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 160000
    val nTargets = if (args.length > 1) args(1).toInt else 40000
    // small chunkRows emulates a corpus-scale CHUNK COUNT without encoding
    // corpus-scale bytes: the join cost is O(chunk rows x urls[/P]), and
    // chunk rows per home dir is what grows with table size
    val chunkRows = if (args.length > 2) args(2).toInt else 0
    val spark = graft.Bench.newSession("32")
    import spark.implicits._

    val out = "/dev/shm/graft_bench/presence_ab"
    graft.Bench.deleteDir(out)
    val pages = graft.spark.PagesGen.generate(spark, nPages, hostSkew = true, partitions = 32)
    val cfg =
      if (chunkRows > 0) graft.spark.EncodeConfig(numPartitions = 32, chunkRows = chunkRows)
      else graft.spark.EncodeConfig(numPartitions = 32)
    graft.spark.EncodeJob.run(spark, pages, out, cfg)
    val meta = graft.spark.EncodeJob.readMeta(spark, out)
    require(meta.isDefined)

    // target urls: half stored, half absent (the redelivered-takedown mix)
    val stored = (0 until nTargets / 2).map(i =>
      graft.spark.PagesGen.page(42L, (i * 3 % nPages).toLong, 100, hostSkew = true).url)
    val absent = (0 until nTargets / 2).map(i => s"https://absent$i.example/x")
    val urls = (stored ++ absent).distinct

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // shipped shape: equi key + range residual (via the production helper)
    def equiCount(): Long = {
      val (covering, _) = graft.spark.EncodeJob.presenceScan(spark, out, urls, meta)
      covering.count()
    }
    // former shape: the folded disjunctive predicate over the same inputs
    def foldedCount(): Long = {
      val homeCfg = graft.spark.EncodeConfig(
        numPartitions = meta.get.numPartitions, saltFactor = meta.get.saltFactor)
      val pairs = urls.toDF("url")
        .withColumn("part_id", graft.spark.EncodeJob.partIdCol(homeCfg))
        .as[(String, Int)].collect()
      val targets = spark.createDataset(pairs.toIndexedSeq).toDF("d_url", "d_part")
      val homePids = pairs.map(_._2).distinct.toSeq
      val urlChunks = spark.read.parquet(graft.spark.EncodeJob.chunksPath(out))
        .filter($"part_id".isin(homePids: _*))
        .select($"part_id", $"url_min", $"url_max", $"url.payload".as("payload"))
      val pidMatch = $"d_part".isNull || col("part_id") === $"d_part"
      val j = urlChunks.join(targets,
        pidMatch && $"d_url" >= $"url_min" && $"d_url" <= $"url_max", "left_semi")
      if (sys.env.contains("PRESENCE_AB_EXPLAIN"))
        println("FOLDED_PLAN:\n" + j.queryExecution.executedPlan.toString)
      j.count()
    }

    // warm both once (parquet footer cache, codegen), then measure
    equiCount(); foldedCount()
    val (cEq, tEq) = time(equiCount())
    val (cFo, tFo) = time(foldedCount())
    require(cEq == cFo, s"shapes disagree: equi=$cEq folded=$cFo")
    println(f"PRESENCE_AB pages=$nPages targets=${urls.size} covering=$cEq " +
      f"equi=${tEq}%.3fs folded=${tFo}%.3fs speedup=${tFo / tEq}%.2fx")
    spark.stop()
  }
}
