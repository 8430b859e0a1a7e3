package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

import graft.codec.ColumnCodec

/** Inverse of [[EncodeJob]]: encoded-chunks table -> pages rows,
  * bit-identical (the BASELINE.json:15 invariant is checked by
  * [[VerifyJob]] on top of this).
  *
  * Plan shape: one shuffle (groupByKey on (part_id, chunk_id) — the data
  * moved is the *compressed* payload, ~raw/ratio bytes), then a narrow
  * decode kernel. Column pruning applies when a caller selects fewer
  * columns *before* materializing rows; per-column decode is available via
  * [[decodeColumn]] for that path (only the requested column's chunks are
  * scanned — Parquet predicate/column pushdown keeps the scan minimal).
  */
object DecodeJob {

  def run(spark: SparkSession, outDir: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.parquet(EncodeJob.chunksPath(outDir))
      .as[EncodedChunk]
      .groupByKey(c => (c.part_id, c.chunk_id))
      .flatMapGroups { (_: (Int, Int), chunks: Iterator[EncodedChunk]) =>
        val byCol = chunks.map(c => c.col_name -> c.payload).toMap
        val urls = ColumnCodec.decodeBinary(byCol("url"))
        val tss = ColumnCodec.decodeLong(byCol("warc_ts"))
        val htmls = ColumnCodec.decodeBinaryNullable(byCol("html"))
        val texts = ColumnCodec.decodeBinaryNullable(byCol("text"))
        val langs = ColumnCodec.decodeBinaryNullable(byCol("lang"))
        def ns(b: Array[Byte]): String = if (b == null) null else new String(b, UTF_8)
        urls.indices.iterator.map { i =>
          val ts = new java.sql.Timestamp(Math.floorDiv(tss(i), 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(tss(i), 1000000L) * 1000L).toInt)
          Page(
            new String(urls(i), UTF_8),
            ts,
            htmls(i),
            ns(texts(i)),
            ns(langs(i))
          )
        }
      }
  }

  /** Decode a single column (positional within (part_id, chunk_id)) —
    * the column-pruned read path.
    */
  def decodeColumn(spark: SparkSession, outDir: String, colName: String): Dataset[(Int, Int, Int, Array[Byte])] = {
    import spark.implicits._
    spark.read.parquet(EncodeJob.chunksPath(outDir))
      .filter($"col_name" === colName)
      .as[EncodedChunk]
      .flatMap { c =>
        ColumnCodec.decodeBinaryNullable(c.payload).iterator.zipWithIndex.map { case (v, i) =>
          (c.part_id, c.chunk_id, i, v)
        }
      }
  }
}
