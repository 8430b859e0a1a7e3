package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

object SparkOverheadProbe {
  def main(args: Array[String]): Unit = {
    val n = 40000L
    Seq(8, 32).foreach { cpus =>
      val spark = graft.Bench.newSession(cpus.toString)
      import spark.implicits._

      // variant A: raw range -> generate text in-task -> encode (no encoders)
      def runA(): Long = spark.range(0, n, 1, 128).mapPartitions { it =>
        var s = 0L
        it.foreach { id =>
          val t = graft.spark.PagesGen.page(42L, id, 100, hostSkew = false).text.getBytes(UTF_8)
          s += graft.codec.Pipelines.textEncode(t).length
        }
        Iterator.single(s)
      }.reduce(_ + _)

      // variant B: through Dataset[Page] (full row materialization)
      val pages = graft.spark.PagesGen.generate(spark, n, hostSkew = true, partitions = 128)
      def runB(): Long = pages.mapPartitions { it =>
        var s = 0L
        it.foreach(p => s += graft.codec.Pipelines.textEncode(p.text.getBytes(UTF_8)).length)
        Iterator.single(s)
      }.reduce(_ + _)

      runA(); runB() // warm
      (1 to 3).foreach { rep =>
        var t0 = System.nanoTime(); runA()
        val secA = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); runB()
        val secB = (System.nanoTime() - t0) / 1e9
        println(f"OVERHEAD cpus=$cpus rep=$rep rawRange=$secA%.2f datasetPage=$secB%.2f")
      }
      spark.stop()
    }
  }
}
