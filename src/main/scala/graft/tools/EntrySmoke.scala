package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives SparkEntry.entry exactly as the driver's smoke-check would. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
