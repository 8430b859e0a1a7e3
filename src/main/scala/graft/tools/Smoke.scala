package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets.UTF_8

/** End-to-end smoke drive of the codec kernels through Spark executors on
  * the real harness parquet: distributed encode -> decode roundtrip, codec
  * histogram, size-vs-reference gate, FM-index search sanity.
  *
  * Usage: sbt "runMain graft.tools.Smoke /root/testdata/sf0.001"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]

    val res = docs.mapPartitions { it =>
      it.map { case (id, text) =>
        val raw = text.getBytes(UTF_8)
        val enc = graft.codec.Pipelines.textEncode(raw)
        val dec = graft.codec.Pipelines.textDecode(enc)
        val ok = java.util.Arrays.equals(raw, dec)
        val (refRle, refMtf) = graft.codec.Pipelines.referenceCosts(raw)
        val fm = graft.codec.FmIndex.build(raw)
        val cntE = fm.count("e".getBytes(UTF_8)).getOrElse(0)
        val naiveE = raw.count(_ == 'e'.toByte)
        (id, ok, raw.length.toLong, enc.length.toLong, math.min(refRle, refMtf), cntE == naiveE)
      }
    }.toDF("doc_id", "roundtrip_ok", "raw_bytes", "enc_bytes", "ref_cost", "fm_ok")
    res.cache()

    val n = res.count()
    val bad = res.filter(!$"roundtrip_ok").count()
    val fmBad = res.filter(!$"fm_ok").count()
    val overRef = res.filter($"enc_bytes" > $"ref_cost").count()
    val agg = res.selectExpr("sum(raw_bytes) raw", "sum(enc_bytes) enc", "sum(ref_cost) ref").first()
    println(s"SMOKE docs=$n roundtrip_failures=$bad fm_failures=$fmBad over_ref_cost=$overRef")
    println(s"SMOKE raw=${agg.getLong(0)} engine=${agg.getLong(1)} ref=${agg.getLong(2)} " +
      f"ratio_engine=${agg.getLong(1).toDouble / agg.getLong(0)}%.4f ratio_ref=${agg.getLong(2).toDouble / agg.getLong(0)}%.4f")
    spark.stop()
    if (bad > 0 || fmBad > 0 || overRef > 0) sys.exit(1)
  }
}
