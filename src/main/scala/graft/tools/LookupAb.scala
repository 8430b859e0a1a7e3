package graft.tools

/** A/B the batched lookupUrls (48 urls per codegen'd scan, shipped)
  * against the former single-scan shape (one 256-url OR predicate, which
  * trips the 64 KB whole-stage-codegen fallback) on one stored table —
  * measures both the batching overhead and what the interpreted fallback
  * actually costs at point-read scale.
  *
  * Usage: runMain graft.tools.LookupAb [nPages] [nUrls] [chunkRows]
  * (chunkRows substantiates the README knob: smaller chunks = less decode
  * per point read, at some compression-ratio cost — both printed)
  */
object LookupAb {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 640000
    val nUrls = if (args.length > 1) args(1).toInt else 256
    val chunkRows = if (args.length > 2) args(2).toInt else 1024
    val spark = graft.Bench.newSession("32")

    val out = "/dev/shm/graft_bench/lookup_ab"
    graft.Bench.deleteDir(out)
    val pages = graft.spark.PagesGen.generate(spark, nPages, hostSkew = true, partitions = 32)
    graft.spark.EncodeJob.run(spark, pages, out,
      graft.spark.EncodeConfig(numPartitions = 32, chunkRows = chunkRows))
    val urls = (0 until nUrls).map(i =>
      graft.spark.PagesGen.page(42L, (i * 7 % nPages).toLong, 100, hostSkew = true).url).distinct

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def lookupCount(): Long =
      graft.spark.DecodeJob.lookupUrls(spark, out, urls).count()

    lookupCount() // warm (footer cache, codegen)
    val (cNew, tNew) = time(lookupCount())
    graft.spark.DecodeJob.lookupUrlsPerScanForTest = Some(nUrls) // former single-scan shape
    lookupCount() // warm the fallback path too
    val (cOld, tOld) = time(lookupCount())
    graft.spark.DecodeJob.lookupUrlsPerScanForTest = None
    require(cNew == cOld, s"shapes disagree: batched=$cNew single=$cOld")
    val lin = spark.read.parquet(s"$out/_lineage")
      .selectExpr("sum(bytes_in) as bi", "sum(bytes_out) as bo").collect()(0)
    val storedRatio = lin.getLong(1).toDouble / lin.getLong(0)
    println(f"LOOKUP_AB pages=$nPages urls=${urls.size} chunkRows=$chunkRows hits=$cNew " +
      f"batched=${tNew}%.3fs single_scan_fallback=${tOld}%.3fs ratio=${tOld / tNew}%.2fx " +
      f"stored_ratio=${storedRatio}%.4f")
    spark.stop()
  }
}
