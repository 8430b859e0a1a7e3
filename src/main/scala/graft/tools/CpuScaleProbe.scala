package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

object CpuScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 40000L
    Seq(8, 32).foreach { cpus =>
      val spark = graft.Bench.newSession(cpus.toString)
      import spark.implicits._
      val pages = graft.spark.PagesGen.generate(spark, n, hostSkew = true, partitions = 128)
      // narrow, no shuffle, no write: pure codec compute
      def run(): Long = pages.mapPartitions { it =>
        var s = 0L
        it.foreach { p =>
          s += graft.codec.Pipelines.textEncode(p.text.getBytes(UTF_8)).length
        }
        Iterator.single(s)
      }.reduce(_ + _)
      run() // warm
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CPUPROBE cpus=$cpus sec=$sec%.2f")
      spark.stop()
    }
  }
}
