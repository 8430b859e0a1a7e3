package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

object EncoderBisect {
  def main(args: Array[String]): Unit = {
    val n = 40000L
    Seq(8, 32).foreach { cpus =>
      val spark = graft.Bench.newSession(cpus.toString)
      import spark.implicits._

      def encodeAll(it: Iterator[String]): Iterator[Long] = {
        var s = 0L
        it.foreach(t => s += graft.codec.Pipelines.textEncode(t.getBytes(UTF_8)).length)
        Iterator.single(s)
      }

      // strings only
      val dsStr = spark.range(0, n, 1, 128).map { id =>
        val p = graft.spark.PagesGen.page(42L, id, 100, hostSkew = false)
        (p.url, p.text)
      }
      // strings + timestamp
      val dsTs = spark.range(0, n, 1, 128).map { id =>
        val p = graft.spark.PagesGen.page(42L, id, 100, hostSkew = false)
        (p.url, p.warc_ts, p.text)
      }
      // strings + binary
      val dsBin = spark.range(0, n, 1, 128).map { id =>
        val p = graft.spark.PagesGen.page(42L, id, 100, hostSkew = false)
        (p.url, p.html, p.text)
      }

      def time(name: String)(f: => Unit): Unit = {
        f
        val t0 = System.nanoTime(); f
        println(f"BISECT cpus=$cpus $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("str_only")(dsStr.mapPartitions(it => encodeAll(it.map(_._2))).reduce(_ + _))
      time("with_ts")(dsTs.mapPartitions(it => encodeAll(it.map(_._3))).reduce(_ + _))
      time("with_bin")(dsBin.mapPartitions(it => encodeAll(it.map(_._3))).reduce(_ + _))
      spark.stop()
    }
  }
}
