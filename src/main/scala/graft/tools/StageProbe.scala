package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 320000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Bench.newSession(cpus)

    val stages = mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val taskTime = si.taskMetrics.executorRunTime
        val gcTime = si.taskMetrics.jvmGCTime
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks, wall, taskTime, gcTime))
      }
    })

    val out = "/dev/shm/graft_bench/stageprobe"
    graft.Bench.deleteDir(out)
    val cfg = graft.spark.EncodeConfig(numPartitions = 128, saltFactor = 8)
    // warmup
    val warm = graft.spark.PagesGen.generate(spark, n / 8, hostSkew = true, partitions = 128)
    graft.spark.EncodeJob.run(spark, warm, out, cfg)
    graft.Bench.deleteDir(out)
    stages.clear()

    val pages = graft.spark.PagesGen.generate(spark, n, hostSkew = true, partitions = 128)
    val t0 = System.nanoTime()
    graft.spark.EncodeJob.run(spark, pages, out, cfg)
    println(f"STAGEPROBE total ${(System.nanoTime() - t0) / 1e9}%.2f s (cpus=$cpus)")
    stages.foreach { case (id, name, nt, wall, tt, gc) =>
      println(f"STAGE $id%3d $name%-60s tasks=$nt%4d wall=${wall / 1000.0}%7.2f s taskTime=${tt / 1000.0}%8.2f s gc=${gc / 1000.0}%6.2f s")
    }
    spark.stop()
    graft.Bench.deleteDir(out)
  }
}
