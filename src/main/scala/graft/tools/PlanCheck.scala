package graft.tools

import graft.Bench

object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Bench.newSession("8")
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 400L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
    val ds = spark.createDataset(vecs)
    val dir = "/tmp/plancheck_ivf"
    Bench.deleteDir(dir)
    graft.pipeline.AnnIndexJob.buildIvf(spark, ds, dir, nLists = 8)
    // capture the pruned-scan plan: filter on the partition column
    val assign = spark.read.parquet(s"$dir/ivf_assign")
    val pruned = assign.filter(org.apache.spark.sql.functions.col("list_id").isin(0L, 3L))
    println("=== PLAN START")
    println(pruned.queryExecution.executedPlan.toString.take(3000))
    println("=== partitions scanned: " + pruned.rdd.getNumPartitions)
    println("=== rows: " + pruned.count() + " of " + assign.count())
    spark.stop()
  }
}
