package graft.tools

import org.apache.spark.sql.functions._

object TimeEncodeParts {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 8000L
    val spark = graft.Bench.newSession("32")
    import spark.implicits._

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val pages = graft.spark.PagesGen.generate(spark, n, hostSkew = true, partitions = 32)
    val cfg = graft.spark.EncodeConfig(numPartitions = 64)

    // replicate EncodeJob internals piecewise
    val withPart = pages.withColumn("part_id", graft.spark.EncodeJob.partIdCol(cfg))
    val chunks = withPart
      .repartition(64, $"part_id")
      .sortWithinPartitions($"part_id", $"url")
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
      .mapPartitions(it => graft.spark.EncodeJobProbe.encodePartition(it, cfg.chunkRows))

    timed("encodePartition+sumLen") {
      println("payload " + chunks.map(_.columns.map(_._2.payload.length.toLong).sum).reduce(_ + _))
    }
    val out = "/root/repo/target/bench/tep"
    graft.Bench.deleteDir(out)
    timed("write parquet partitionBy") {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      chunks.toDF().write.mode("overwrite").partitionBy("part_id").parquet(out + "/chunks")
    }
    timed("lineage agg") {
      val written = spark.read.parquet(out + "/chunks")
      written.groupBy($"part_id")
        .agg(
          sum($"n_rows").as("n_rows"),
          countDistinct($"chunk_id").as("n_chunks"),
          sum(expr("url.bytes_in + warc_ts.bytes_in + html.bytes_in + text.bytes_in + lang.bytes_in")).as("bytes_in"),
          sum(expr("url.bytes_out + warc_ts.bytes_out + html.bytes_out + text.bytes_out + lang.bytes_out")).as("bytes_out"),
          concat_ws(",", sort_array(collect_set($"text.codec"))).as("codecs"),
          expr("aggregate(collect_list(xxhash64(url.payload) ^ xxhash64(text.payload)), 0L, (a, x) -> a ^ x)").as("payload_hash")
        ).collect()
    }
    spark.stop()
  }
}
