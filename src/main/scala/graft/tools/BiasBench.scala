package graft.tools

/** Measures the codec-policy speed/size trade (EncodeConfig.bwtBias) on
  * the standard PagesGen corpus so the BENCH/BASELINE.md bias rows are
  * reproducible:
  *   - bias=1.0 (default): size-optimal, BWT+MTF+RLE+Huffman pre-encode
  *   - bias=0.0 pre-encode: speed-biased, order-0 Huffman only (no SA/BWT)
  *   - bias=0.0 chunk path: FSST chunk compression (mapSidePreEncode=false)
  * Usage: runMain graft.tools.BiasBench [nPages]
  */
object BiasBench {

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = graft.Bench.newSession("32")
    import spark.implicits._
    val pagesPath = s"/dev/shm/graft_bench/bias_pages_$nPages.parquet"
    if (!new java.io.File(pagesPath).exists()) {
      graft.spark.PagesGen.generate(spark, nPages, hostSkew = true, partitions = 128)
        .write.mode("overwrite").parquet(pagesPath)
    }
    val pages = spark.read.parquet(pagesPath).as[graft.spark.Page]

    def run(label: String, cfg: graft.spark.EncodeConfig): Unit = {
      val out = s"/dev/shm/graft_bench/bias_$label"
      // warmup + measured rep, best of 2 measured
      var best = Double.MaxValue
      var bytesIn = 0L
      var bytesOut = 0L
      (0 to 2).foreach { rep =>
        graft.Bench.deleteDir(out)
        val t0 = System.nanoTime()
        graft.spark.EncodeJob.run(spark, pages, out, cfg)
        val sec = (System.nanoTime() - t0) / 1e9
        val row = spark.read.parquet(graft.spark.EncodeJob.lineagePath(out))
          .agg(org.apache.spark.sql.functions.sum("bytes_in"),
            org.apache.spark.sql.functions.sum("bytes_out")).first()
        if (rep > 0 && sec < best) { best = sec; bytesIn = row.getLong(0); bytesOut = row.getLong(1) }
      }
      val gbps = bytesIn / 1e9 / best
      val ratio = bytesOut.toDouble / bytesIn
      println(f"""BIAS {"label":"$label","sec":$best%.2f,"gb_per_sec":$gbps%.4f,"ratio":$ratio%.4f,"bytes_in":$bytesIn}""")
      graft.Bench.deleteDir(out)
    }

    run("pre_bias1.0_sizeopt",
      graft.spark.EncodeConfig(numPartitions = 64, bwtBias = 1.0, mapSidePreEncode = true))
    run("pre_bias0.0_speed",
      graft.spark.EncodeConfig(numPartitions = 64, bwtBias = 0.0, mapSidePreEncode = true))
    run("chunk_bias0.0_fsst",
      graft.spark.EncodeConfig(numPartitions = 64, bwtBias = 0.0, mapSidePreEncode = false))
    run("chunk_bias0.5",
      graft.spark.EncodeConfig(numPartitions = 64, bwtBias = 0.5, mapSidePreEncode = false))
    spark.stop()
  }
}
