package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

import graft.codec.ColumnCodec

/** One encoded column chunk: the unit of the encoded-chunks table.
  * `payload` is self-describing (ColumnCodec id byte first).
  */
final case class EncodedChunk(
    part_id: Int,
    chunk_id: Int,
    col_name: String,
    codec: String,
    n_rows: Int,
    bytes_in: Long,
    bytes_out: Long,
    payload: Array[Byte]
)

/** Per-partition lineage record — the Iceberg-snapshot stand-in demanded by
  * the north rule (BASELINE.json:14: "resumable from checkpoint with
  * per-partition lineage + metrics"; no Iceberg jars ship in
  * /opt/spark/jars, so the same information lives in a `_lineage` parquet
  * table next to the chunks).
  */
final case class LineageRecord(
    part_id: Int,
    n_rows: Long,
    n_chunks: Long,
    bytes_in: Long,
    bytes_out: Long,
    codecs: String, // col=codec[,codec...] summary
    payload_hash: Long, // xor-combined xxhash of payloads (symbol-table hash analogue)
    status: String
)

final case class EncodeConfig(
    numPartitions: Int = 32,
    saltFactor: Int = 4, // spreads each url-host over this many partitions
    chunkRows: Int = 1024 // codec unit; bounds kernel memory at any scale
)

/** The north-rule batch encode: pages -> salted explicit hash partitioning
  * -> per-partition column-chunk encoding (typed mapPartitions kernels) ->
  * encoded-chunks parquet partitioned by part_id + lineage records.
  *
  * Scale design (SURVEY.md §3.1): exactly ONE shuffle (the explicit
  * repartition by salted part_id); everything after is partition-local.
  * part_id is a pure function of the row (not of Spark's physical
  * partitioning), so any failed/missing partition can be recomputed
  * idempotently from the same input — that plus the lineage table is the
  * resume contract. Skew: url-host hot keys are spread over `saltFactor`
  * partitions via a hash-salt on the full url (north rule's salting).
  */
object EncodeJob {

  /** Deterministic salted partition id column for a pages dataset. */
  def partIdCol(cfg: EncodeConfig) = {
    val host = regexp_extract(col("url"), "https?://([^/]+)/", 1)
    val salt = pmod(xxhash64(col("url")), lit(cfg.saltFactor))
    pmod(xxhash64(host, salt), lit(cfg.numPartitions)).cast("int")
  }

  def lineagePath(outDir: String) = s"$outDir/_lineage"
  def chunksPath(outDir: String) = s"$outDir/chunks"

  /** Part ids already completed according to the lineage table. */
  def donePartIds(spark: SparkSession, outDir: String): Set[Int] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(lineagePath(outDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else
      spark.read.parquet(lineagePath(outDir))
        .filter($"status" === "done")
        .select("part_id").distinct().as[Int].collect().toSet
  }

  /** Encode all not-yet-done partitions; returns the lineage records of
    * this run. Idempotent: re-running after a partial failure encodes only
    * the missing part_ids and overwrites only their output directories
    * (dynamic partition overwrite).
    */
  def run(
      spark: SparkSession,
      pages: Dataset[Page],
      outDir: String,
      cfg: EncodeConfig = EncodeConfig()
  ): Dataset[LineageRecord] = {
    import spark.implicits._

    val done = donePartIds(spark, outDir)
    val withPart = pages.withColumn("part_id", partIdCol(cfg))
    val todo =
      if (done.isEmpty) withPart
      else withPart.filter(!$"part_id".isin(done.toSeq: _*))

    val chunks = todo
      .repartition(cfg.numPartitions, $"part_id")
      .sortWithinPartitions($"part_id", $"url") // deterministic chunk layout
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
      .mapPartitions { it =>
        encodePartition(it, cfg.chunkRows)
      }

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    chunks.toDF()
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_id")
      .parquet(chunksPath(outDir))

    // lineage from the durably written chunks (not the in-flight dataset)
    val written = spark.read.parquet(chunksPath(outDir))
      .filter(if (done.isEmpty) lit(true) else !$"part_id".isin(done.toSeq: _*))
    val lineage = written
      .groupBy($"part_id")
      .agg(
        (sum($"n_rows") / lit(5)).cast("long").as("n_rows"), // 5 column rows per chunk
        (countDistinct($"chunk_id")).as("n_chunks"),
        sum(when($"col_name" === "text", $"bytes_in").otherwise(0L)).as("bytes_in_text"),
        sum($"bytes_in").as("bytes_in"),
        sum($"bytes_out").as("bytes_out"),
        concat_ws(",", sort_array(collect_set(concat($"col_name", lit("="), $"codec")))).as("codecs"),
        expr("aggregate(collect_list(xxhash64(payload)), 0L, (a, x) -> a ^ x)").as("payload_hash")
      )
      .select(
        $"part_id".cast("int"),
        $"n_rows", $"n_chunks", $"bytes_in", $"bytes_out", $"codecs", $"payload_hash",
        lit("done").as("status")
      )
      .as[LineageRecord]

    lineage.write.mode(SaveMode.Append).parquet(lineagePath(outDir))
    spark.read.parquet(lineagePath(outDir)).as[LineageRecord]
  }

  /** Partition-local kernel: group rows by part_id (a task can own several
    * after the hash exchange), slice into chunkRows-sized chunks, encode
    * each column independently. Bounded memory: one chunk of each column
    * materialized at a time per part group.
    */
  private def encodePartition(
      it: Iterator[(String, java.sql.Timestamp, Array[Byte], String, String, Int)],
      chunkRows: Int
  ): Iterator[EncodedChunk] = {
    val byPart = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[(String, java.sql.Timestamp, Array[Byte], String, String)]]
    it.foreach { case (url, ts, html, text, lang, pid) =>
      byPart.getOrElseUpdate(pid, scala.collection.mutable.ArrayBuffer.empty) +=
        ((url, ts, html, text, lang))
    }
    byPart.iterator.flatMap { case (pid, rows) =>
      rows.grouped(chunkRows).zipWithIndex.flatMap { case (chunk, cid) =>
        val urls = chunk.map(_._1.getBytes(UTF_8)).toArray
        val tss = chunk.map { r =>
          Math.floorDiv(r._2.getTime, 1000L) * 1000000L + r._2.getNanos / 1000L
        }.toArray
        val htmls = chunk.map(_._3).toArray
        val texts = chunk.map(_._4.getBytes(UTF_8)).toArray
        val langs = chunk.map(_._5.getBytes(UTF_8)).toArray
        def bin(name: String, values: Array[Array[Byte]]): EncodedChunk = {
          val payload = ColumnCodec.encodeBinary(values)
          EncodedChunk(pid, cid, name, ColumnCodec.codecName(payload),
            values.length, values.map(_.length.toLong).sum, payload.length.toLong, payload)
        }
        val tsPayload = ColumnCodec.encodeLong(tss)
        Seq(
          bin("url", urls),
          EncodedChunk(pid, cid, "warc_ts", ColumnCodec.codecName(tsPayload),
            tss.length, tss.length * 8L, tsPayload.length.toLong, tsPayload),
          bin("html", htmls),
          bin("text", texts),
          bin("lang", langs)
        )
      }
    }
  }
}
