package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

object ThreadScaleProbe {
  def main(args: Array[String]): Unit = {
    val docsPerThread = 2000
    val texts = (0L until docsPerThread.toLong).map(i =>
      graft.spark.PagesGen.page(42L, i, 100, hostSkew = false).text.getBytes(UTF_8)).toArray
    val bytes = texts.map(_.length.toLong).sum
    // warm
    texts.foreach(t => graft.codec.Pipelines.textEncode(t))
    Seq(1, 8, 32).foreach { threads =>
      val ts = (0 until threads).map { _ =>
        new Thread(() => texts.foreach(t => graft.codec.Pipelines.textEncode(t)))
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"THREADS $threads%2d  total=${bytes * threads / 1e6}%.0f MB  sec=$sec%.2f  agg=${bytes * threads / 1e6 / sec}%.1f MB/s")
    }
  }
}
