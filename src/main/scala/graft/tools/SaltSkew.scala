package graft.tools
import org.apache.spark.sql.functions._
object SaltSkew {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.newSession("8")
    import spark.implicits._
    val pages = spark.read.parquet(graft.Bench.preparePages(spark, "/root/testdata/sf0.1"))
    for (salt <- Seq(2, 4, 8, 16, 32, 64)) {
      val cfg = graft.spark.EncodeConfig(numPartitions = 64, saltFactor = salt)
      val sizes = pages.withColumn("p", graft.spark.EncodeJob.partIdCol(cfg))
        .groupBy($"p").agg(sum(length($"text") + length($"html")).as("b"))
        .select($"b").as[Long].collect().sorted
      val med = sizes(sizes.length / 2)
      println(f"SALT $salt%3d parts=${sizes.length}%3d med=${med}%9d max=${sizes.last}%9d max/med=${sizes.last.toDouble / med}%.2f")
    }
    spark.stop()
  }
}
