package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets.UTF_8

object TimeSparkEncode {
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

    timed("generate+count")(pages.count())
    timed("generate+count again")(pages.count())

    val cfg = graft.spark.EncodeConfig(numPartitions = 64)
    val withPart = pages.withColumn("part_id", graft.spark.EncodeJob.partIdCol(cfg))
    timed("repartition+sort+bytes") {
      withPart.repartition(64, $"part_id").sortWithinPartitions($"part_id", $"url")
        .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
        .mapPartitions { it => Iterator.single(it.map(_._4.length.toLong).sum) }
        .collect()
    }
    timed("repart+sort+textEncode") {
      withPart.repartition(64, $"part_id").sortWithinPartitions($"part_id", $"url")
        .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
        .mapPartitions { it =>
          var s = 0L
          it.foreach { r =>
            s += graft.codec.Pipelines.textEncode(r._4.getBytes(UTF_8)).length
            s += graft.codec.Pipelines.textEncode(r._3).length
          }
          Iterator.single(s)
        }
        .collect()
    }
    val out = "/root/repo/target/bench/time_spark_encode"
    graft.Bench.deleteDir(out)
    timed("full EncodeJob")(graft.spark.EncodeJob.run(spark, pages, out, cfg))
    spark.stop()
  }
}
