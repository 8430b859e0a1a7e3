package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Profiles the EXACT sf0.1 bench window (guide §1): runs graft.Bench's own
  * workloads (same session, same warmup protocol) with a job/stage listener
  * attached, and prints, per query, the job timeline — job wall, stage
  * wall, task time, GC — plus the driver-side gap (query wall minus job
  * wall), which is where writeMeta-style small actions and planning hide.
  * Bench.scala itself is frozen; this is the §1.4-style isolation harness.
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Set[String] = if (args.nonEmpty) args.toSet else Set.empty
    val spark = graft.Bench.newSession(cpus)

    case class JobRec(id: Int, var desc: String, var start: Long, var end: Long,
                      var stageWall: Long, var taskTime: Long, var gc: Long,
                      var tasks: Int, var stages: Int)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time, 0L, 0L, 0L, 0L, 0, 0)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stageWall += si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          j.taskTime += si.taskMetrics.executorRunTime
          j.gc += si.taskMetrics.jvmGCTime
          j.tasks += si.numTasks
          j.stages += 1
        }
      }
    })

    // warmup exactly as Bench.main does
    graft.Bench.workloads("/root/testdata/sf0.001").foreach { case (_, fn) =>
      try fn(spark) catch { case _: Throwable => }
    }
    graft.Bench.preparePages(spark, sfDir)

    graft.Bench.workloads(sfDir).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        fn(spark)
        val wallMs = (System.nanoTime() - t0) / 1e6
        // let listener events drain (no public waitUntilEmpty; a short
        // sleep suffices for a profiling tool)
        Thread.sleep(300)
        jobs.synchronized {
          val jobWall = jobs.values.map(j => math.max(0L, j.end - j.start)).sum
          println(f"QUERY $name%-20s wall=${wallMs / 1000}%.3f s jobs=${jobs.size}%3d " +
            f"jobWallSum=${jobWall / 1000.0}%.3f s driverGap=${(wallMs - jobWall) / 1000.0}%.3f s")
          jobs.values.foreach { j =>
            println(f"  JOB ${j.id}%4d wall=${math.max(0L, j.end - j.start) / 1000.0}%7.3f s " +
              f"stages=${j.stages}%2d tasks=${j.tasks}%4d stageWall=${j.stageWall / 1000.0}%7.3f " +
              f"taskTime=${j.taskTime / 1000.0}%8.2f gc=${j.gc / 1000.0}%5.2f  ${j.desc.take(60)}")
          }
        }
      }
    }
    spark.stop()
  }
}
