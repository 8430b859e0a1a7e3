package graft.tools

import org.apache.spark.sql.functions._

object EncodePhases {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 320000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    val out = "/root/repo/target/bench/phases"
    graft.Bench.deleteDir(out)
    val cfg = graft.spark.EncodeConfig(numPartitions = 128, saltFactor = 8)
    val pages = graft.spark.PagesGen.generate(spark, n, hostSkew = true, partitions = 128)

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PHASE $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val withPart = pages.withColumn("part_id", graft.spark.EncodeJob.partIdCol(cfg))
    val chunks = withPart
      .repartition(cfg.numPartitions, $"part_id")
      .sortWithinPartitions($"part_id", $"url")
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
      .mapPartitions(it => graft.spark.EncodeJobProbe.encodePartition(it, cfg.chunkRows))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    timed("write(chunks incl encode)") {
      chunks.toDF().write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .partitionBy("part_id").parquet(out + "/chunks")
    }
    timed("lineage agg+write") {
      val written = spark.read.parquet(out + "/chunks")
      written.groupBy($"part_id")
        .agg(
          sum(expr("url.bytes_in + warc_ts.bytes_in + html.bytes_in + text.bytes_in + lang.bytes_in")).as("bytes_in"),
          sum(expr("url.bytes_out + warc_ts.bytes_out + html.bytes_out + text.bytes_out + lang.bytes_out")).as("bytes_out"),
          expr("aggregate(collect_list(url.payload_hash ^ warc_ts.payload_hash ^ html.payload_hash ^ text.payload_hash ^ lang.payload_hash), 0L, (a, x) -> a ^ x)").as("ph"))
        .write.mode("overwrite").parquet(out + "/_lineage_probe")
    }
    spark.stop()
  }
}
