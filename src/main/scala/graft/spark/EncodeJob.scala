package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

import graft.codec.ColumnCodec

/** One column's encoded payload within a chunk row. `payload` is
  * self-describing (ColumnCodec id byte first); `payload_hash` is FNV-1a,
  * computed in-kernel so lineage aggregation never re-scans payload bytes.
  */
final case class ColChunk(
    codec: String,
    bytes_in: Long,
    bytes_out: Long,
    payload_hash: Long,
    payload: Array[Byte]
)

/** One encoded chunk: a url-sorted row slice with ALL FIVE column payloads
  * in one self-contained row. This layout is what makes decode a pure
  * narrow map — no exchange anywhere: a task decodes each row it scans
  * (contrast a row-per-column layout, which must shuffle the compressed
  * payloads to regroup a chunk's columns — at 100 TB that shuffle moves
  * the entire compressed corpus). Column reads stay pruned because the
  * payloads are separate (nested) parquet columns: selecting
  * `text.payload` reads only that leaf.
  */
final case class EncodedChunk(
    part_id: Int,
    chunk_id: Int,
    n_rows: Int,
    url_min: String, // first/last url of the chunk's (url-sorted) row slice:
    url_max: String, // point lookups and range decodes filter chunks on these
    // (pushed to parquet row-group stats) BEFORE touching any payload
    url: ColChunk,
    warc_ts: ColChunk,
    html: ColChunk,
    text: ColChunk,
    lang: ColChunk
) {
  def columns: Seq[(String, ColChunk)] =
    Seq("url" -> url, "warc_ts" -> warc_ts, "html" -> html, "text" -> text, "lang" -> lang)
  def bytesIn: Long = columns.map(_._2.bytes_in).sum
  def bytesOut: Long = columns.map(_._2.bytes_out).sum
  def hashXor: Long = columns.map(_._2.payload_hash).foldLeft(0L)(_ ^ _)
}

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
    chunkRows: Int = 1024, // codec unit; bounds kernel memory at any scale
    bwtBias: Double = 1.0, // text-codec policy: 1.0 size-optimal, <1 speed-biased
    // compress text/html per document BEFORE the exchange (default): the
    // shuffle moves ~ratio x the bytes (0.3x on web text) and the heavy
    // compute runs in the skew-free narrow stage — this is what takes the
    // measured N->4N scaling efficiency from ~0.7 to 0.85-0.91. Trade-off:
    // text/html are containerized per-doc, giving up the chunk-level FSST
    // option for those two columns (per-doc best-of still floors at raw,
    // so the <=-reference size gate is untouched). Set false to shuffle
    // raw rows and keep every chunk-level codec option.
    mapSidePreEncode: Boolean = true,
    // sort (part_id, url) with Catalyst's spillable Tungsten sort and
    // stream the kernel over the sorted iterator (default): task memory is
    // O(chunkRows), so a partition larger than executor memory still
    // encodes — the property that matters when 100 TB / numPartitions
    // stops fitting in heap. Set false for the round-1 in-kernel sort
    // (buffers the whole partition; one less whole-stage pass).
    spillSafeSort: Boolean = true
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
  def metaPath(outDir: String) = s"$outDir/_meta"

  /** The layout-determining half of [[EncodeConfig]], persisted next to
    * the chunks: part_id is a pure function of (url, numPartitions,
    * saltFactor), so a reader who knows these can compute any url's home
    * partition and prune the lookup scan to ONE partition directory.
    */
  final case class EncodeMeta(numPartitions: Int, saltFactor: Int, chunkRows: Int)

  private def writeMeta(spark: SparkSession, outDir: String, cfg: EncodeConfig): Unit = {
    import spark.implicits._
    spark.createDataset(Seq(EncodeMeta(cfg.numPartitions, cfg.saltFactor, cfg.chunkRows)))
      .write.mode(SaveMode.Overwrite).parquet(metaPath(outDir))
  }

  def readMeta(spark: SparkSession, outDir: String): Option[EncodeMeta] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(metaPath(outDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(metaPath(outDir)).as[EncodeMeta].head())
  }

  /** A later write to an existing table must use the same partitioning
    * function, or (part_id, chunk_id) identity and lookup pruning break.
    */
  private def requireLayoutMatch(spark: SparkSession, outDir: String, cfg: EncodeConfig): Unit =
    readMeta(spark, outDir).foreach { m =>
      require(m.numPartitions == cfg.numPartitions && m.saltFactor == cfg.saltFactor,
        s"encoded table at $outDir was written with numPartitions=${m.numPartitions}/" +
          s"saltFactor=${m.saltFactor}; this config says ${cfg.numPartitions}/${cfg.saltFactor}")
    }

  /** True iff the chunks table has at least one COMMITTED data file
    * (staging junk under _temporary / .spark-staging and marker files do
    * not count) — the "does this encoded table exist yet" test.
    */
  private def hasCommittedChunks(spark: SparkSession, outDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(chunksPath(outDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val path = f.getPath.toString
      val name = f.getPath.getName
      if (!path.contains("_temporary") && !path.contains(".spark-staging") &&
          !name.startsWith("_") && !name.startsWith(".")) return true
    }
    false
  }

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

    requireLayoutMatch(spark, outDir, cfg)
    writeMeta(spark, outDir, cfg)
    val done = donePartIds(spark, outDir)
    val withPart = pages.withColumn("part_id", partIdCol(cfg))
    val todo =
      if (done.isEmpty) withPart
      else withPart.filter(!$"part_id".isin(done.toSeq: _*))

    // Lineage metrics are collected per part DURING the encode via an
    // accumulator — no post-hoc re-scan of the written chunks (that extra
    // read was a serial-fraction killer in the scaling runs). The
    // accumulator only reaches the driver when the write action commits,
    // so a lineage row still implies its partition's chunks are durable.
    val acc = new org.apache.spark.util.CollectionAccumulator[LineageRecord]
    spark.sparkContext.register(acc, "graft_lineage")

    // one shuffle; chunk layout determinism comes from the in-kernel sort
    // (cheaper than a whole-stage Catalyst sort over the raw bytes)
    val chunks = encodeChunkStream(todo, cfg, r => acc.add(r))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    chunks.toDF()
      .write.mode(SaveMode.Overwrite)
      .option("parquet.enable.dictionary", "false") // payloads are ~MB blobs
      .option("parquet.block.size", (16 * 1024 * 1024).toString) // bound writer memory
      .option("compression", "none") // payloads are already codec-compressed
      .partitionBy("part_id")
      .parquet(chunksPath(outDir))

    import scala.jdk.CollectionConverters._
    // distinct: stage retries can double-add; records are deterministic
    val records = acc.value.asScala.toSeq.distinct
    if (records.nonEmpty) {
      spark.createDataset(records)
        .write.mode(SaveMode.Append).parquet(lineagePath(outDir))
    }
    // return THIS run's records; the full table lives at lineagePath
    spark.createDataset(records)
  }

  /** Rewrite partitions into fresh optimal layout: decode every chunk of
    * the selected partitions (default all), re-sort by url, re-slice into
    * full chunkRows chunks, and replace the partition directories
    * (dynamic partition overwrite) — the table-maintenance pass that
    * undoes append fragmentation. After N appends a partition holds up to
    * N generations of small tail chunks; lookups then probe several
    * range-overlapping chunks per url and scans pay per-file overhead.
    * Compaction restores the bootstrap layout invariants: one url-sorted
    * chunk sequence per partition with disjoint url ranges. Decode output
    * is bit-identical before vs after (the kernels are deterministic in
    * the row set); lineage rows of compacted partitions are REPLACED so
    * metrics reflect the new layout.
    */
  def compact(
      spark: SparkSession,
      outDir: String,
      cfg: EncodeConfig = EncodeConfig(),
      partIds: Option[Seq[Int]] = None
  ): Dataset[LineageRecord] = {
    import spark.implicits._
    requireLayoutMatch(spark, outDir, cfg)

    val all = spark.read.parquet(chunksPath(outDir))
    val selected = partIds match {
      case Some(ps) => all.filter($"part_id".isin(ps: _*))
      case None => all
    }
    // decode the selected partitions back to pages (narrow map, no
    // exchange) and re-run the encode pipeline on them. part_id is a pure
    // row function, so every page re-lands in its original partition.
    val pages = selected.as[EncodedChunk].mapPartitions { it =>
      it.flatMap { c =>
        val urls = ColumnCodec.decodeBinary(c.url.payload)
        val tss = ColumnCodec.decodeLong(c.warc_ts.payload)
        val htmls = ColumnCodec.decodeBinaryNullable(c.html.payload)
        val texts = ColumnCodec.decodeBinaryNullable(c.text.payload)
        val langs = ColumnCodec.decodeBinaryNullable(c.lang.payload)
        def ns(b: Array[Byte]): String = if (b == null) null else new String(b, UTF_8)
        urls.indices.iterator.map { i =>
          val ts = new java.sql.Timestamp(Math.floorDiv(tss(i), 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(tss(i), 1000000L) * 1000L).toInt)
          Page(new String(urls(i), UTF_8), ts, htmls(i), ns(texts(i)), ns(langs(i)))
        }
      }
    }
    val withPart = pages.withColumn("part_id", partIdCol(cfg))

    val acc = new org.apache.spark.util.CollectionAccumulator[LineageRecord]
    spark.sparkContext.register(acc, "graft_lineage_compact")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    encodeChunkStream(withPart, cfg, r => acc.add(r))
      .toDF()
      .write.mode(SaveMode.Overwrite)
      .option("parquet.enable.dictionary", "false")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .option("compression", "none")
      .partitionBy("part_id")
      .parquet(chunksPath(outDir))

    import scala.jdk.CollectionConverters._
    val records = acc.value.asScala.toSeq.distinct
    // REPLACE the compacted partitions' lineage rows (append would double
    // the metrics); other partitions' rows are carried over untouched
    val lp = new org.apache.hadoop.fs.Path(lineagePath(outDir))
    val lfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val compactedParts = records.map(_.part_id).toSet
    val kept =
      if (!lfs.exists(lp)) Seq.empty
      else spark.read.parquet(lineagePath(outDir)).as[LineageRecord]
        .collect().toSeq.filterNot(r => compactedParts.contains(r.part_id))
    val newLineage = kept ++ records
    if (newLineage.nonEmpty) {
      // write-then-swap so a crash never leaves the lineage table empty
      val tmp = lineagePath(outDir) + "_compact_tmp"
      spark.createDataset(newLineage).write.mode(SaveMode.Overwrite).parquet(tmp)
      lfs.delete(lp, true)
      lfs.rename(new org.apache.hadoop.fs.Path(tmp), lp)
    }
    spark.createDataset(records)
  }

  /** The shared exchange + kernel pipeline of [[run]] and [[append]]:
    * pages-with-part_id rows in, EncodedChunk stream out (chunk ids start
    * at 0 per part; [[append]] shifts them afterwards).
    */
  private def encodeChunkStream(
      todo: DataFrame,
      cfg: EncodeConfig,
      onPart: LineageRecord => Unit
  ): Dataset[EncodedChunk] = {
    val spark = todo.sparkSession
    import spark.implicits._
    if (!cfg.mapSidePreEncode) {
      todo
        .repartition(cfg.numPartitions, $"part_id")
        .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
        .mapPartitions { it =>
          encodePartitionImpl(it, cfg.chunkRows, onPart, cfg.bwtBias)
        }
    } else {
      // narrow pre-encode of the two heavy columns BEFORE the exchange;
      // each value becomes varint(rawLen) ++ textEncode(bytes)
      val bias = cfg.bwtBias
      val pre = todo
        .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
        .mapPartitions { it =>
          it.map { case (url, ts, html, text, lang, pid) =>
            (url, ts, preEncodeValue(html, bias),
              preEncodeValue(if (text == null) null else text.getBytes(UTF_8), bias),
              lang, pid)
          }
        }
      val shuffled = pre.repartition(cfg.numPartitions, $"_6")
      if (cfg.spillSafeSort)
        // Catalyst (Tungsten) sort spills to disk when a partition exceeds
        // task memory; the streaming kernel then holds only one chunk
        shuffled
          .sortWithinPartitions($"_6", $"_1")
          .mapPartitions { it =>
            encodePreEncodedSorted(it, cfg.chunkRows, onPart, cfg.bwtBias)
          }
      else
        shuffled.mapPartitions { it =>
          encodePreEncodedPartition(it, cfg.chunkRows, onPart, cfg.bwtBias)
        }
    }
  }

  /** Chunk-level incremental append: encode ONLY the delta's new urls into
    * NEW chunk files + lineage rows, leaving every existing chunk file
    * untouched (the gap between "resumable" — [[run]]'s partition-grained
    * skip — and "incremental": a daily crawl delta at 100 TB must not
    * re-encode the partitions it lands in).
    *
    * Mechanics:
    *  - part_id is the same pure row function as [[run]]'s, so delta rows
    *    land in their home partitions;
    *  - already-present urls are dropped by decoding the url column of ONLY
    *    those chunks whose `[url_min, url_max]` range covers a delta url
    *    (a range semi-join — on a disjoint delta nothing is decoded);
    *  - new chunks get ids starting past the part's existing count (from
    *    the lineage table), so `(part_id, chunk_id)` stays unique and
    *    [[DecodeJob]] needs no changes;
    *  - chunk files and lineage rows are APPENDED; re-running the same
    *    delta is a no-op (every url dedupes away, nothing is written).
    *
    * Returns this append's lineage records (empty if the delta was fully
    * deduplicated).
    */
  def append(
      spark: SparkSession,
      delta: Dataset[Page],
      outDir: String,
      cfg: EncodeConfig = EncodeConfig()
  ): Dataset[LineageRecord] = {
    import spark.implicits._

    requireLayoutMatch(spark, outDir, cfg)

    // intra-delta dedupe FIRST (it applies to the bootstrap path too): a
    // crawler re-delivering the same url WITHIN one batch is as normal as
    // across batches. Deterministic winner (newest warc_ts, content hash
    // as tie-break) — dropDuplicates would pick a partitioning-dependent
    // row and break re-append idempotence.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, xxhash64(col("text"), col("html"), col("lang")).desc)
    val deduped = delta.toDF()
      .withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1)
      .select("url", "warc_ts", "html", "text", "lang").as[Page]
    val withPart = deduped.withColumn("part_id", partIdCol(cfg))

    // bootstrapping: appending to a dir with no COMMITTED chunks yet IS
    // the initial encode (the natural way to start an incrementally-built
    // table). The gate is "at least one committed data file", NOT bare dir
    // existence (a crash during the bootstrap write leaves the dir with
    // only _temporary/.spark-staging junk, and treating that as an
    // existing table would wedge every redelivery on an unreadable
    // parquet path) and NOT a _SUCCESS marker (the dynamic-partition-
    // overwrite commit run() uses writes none). run()'s Overwrite clears
    // staging leftovers.
    if (!hasCommittedChunks(spark, outDir)) return run(spark, deduped, outDir, cfg)

    // --- dedupe against the stored table via per-chunk url ranges (nested
    // pruning: only the url payload leaf is read, never html/text)
    val urlChunks = spark.read.parquet(chunksPath(outDir))
      .select($"part_id", $"chunk_id", $"url_min", $"url_max", $"url.payload".as("payload"))
    val deltaKeys = withPart.select($"url".as("d_url"), $"part_id".as("d_part"))
    val candidateChunks = urlChunks.join(deltaKeys,
        urlChunks("part_id") === $"d_part" &&
          $"d_url" >= $"url_min" && $"d_url" <= $"url_max",
        "left_semi")
    val existingUrls = candidateChunks.select($"payload").as[Array[Byte]]
      .flatMap(p => ColumnCodec.decodeBinary(p).iterator.map(new String(_, UTF_8)))
      .toDF("url")
    val newRows = withPart.join(existingUrls, Seq("url"), "left_anti")
      // join reorders columns (join key first); restore kernel column order
      .select("url", "warc_ts", "html", "text", "lang", "part_id")

    // --- chunk-id offsets: max existing chunk_id + 1 per part, from the
    // CHUNKS table (metadata-only, column-pruned scan) rather than the
    // lineage table: chunk files commit before lineage rows, so after a
    // crash in that window the lineage undercounts and a lineage-derived
    // offset would reuse an orphaned chunk's (part_id, chunk_id) key
    val offsets: Map[Int, Int] = spark.read.parquet(chunksPath(outDir))
      .groupBy($"part_id").agg(max($"chunk_id").as("m"))
      .as[(Int, Int)].collect().map { case (pid, m) => pid -> (m + 1) }.toMap
    val bcOff = spark.sparkContext.broadcast(offsets)

    val acc = new org.apache.spark.util.CollectionAccumulator[LineageRecord]
    spark.sparkContext.register(acc, "graft_lineage_append")

    encodeChunkStream(newRows, cfg, r => acc.add(r))
      .map(c => c.copy(chunk_id = c.chunk_id + bcOff.value.getOrElse(c.part_id, 0)))
      .toDF()
      .write.mode(SaveMode.Append)
      .option("parquet.enable.dictionary", "false")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .option("compression", "none")
      .partitionBy("part_id")
      .parquet(chunksPath(outDir))

    import scala.jdk.CollectionConverters._
    val records = acc.value.asScala.toSeq.distinct
    if (records.nonEmpty) {
      spark.createDataset(records)
        .write.mode(SaveMode.Append).parquet(lineagePath(outDir))
    }
    spark.createDataset(records)
  }

  /** Map-side pre-encoding of one value: varint(rawLen) ++ textEncode.
    * `bwtBias <= 0` is the speed-biased policy point: skip the BWT pipeline
    * entirely and emit the order-0-Huffman/raw tagged form (~6x the encode
    * throughput at a weaker ratio — measured rows in BENCH/BASELINE.md).
    */
  private[spark] def preEncodeValue(raw: Array[Byte], bwtBias: Double = 1.0): Array[Byte] = {
    if (raw == null) return null
    val enc =
      if (bwtBias <= 0.0) graft.codec.Pipelines.textEncodeFast(raw)
      else graft.codec.Pipelines.textEncode(raw)
    val buf = new graft.codec.Bytes.Buf(enc.length + 5)
    buf.writeVarInt(raw.length)
    buf.writeBytes(enc)
    buf.toArray
  }

  private type PreRow = (String, java.sql.Timestamp, Array[Byte], Array[Byte], String)

  /** Container in BwtBin layout over pre-encoded values (+ null bitmap +
    * Huffman wrap when they pay for themselves); one column of a chunk.
    */
  private def containerizePre(pre: Array[Array[Byte]]): ColChunk = {
    import graft.codec.{Bytes, ColumnCodec}
    var rawBytes = 0L
    val bodies = new Array[Array[Byte]](pre.length)
    var i = 0
    while (i < pre.length) {
      if (pre(i) != null) {
        val rd = new Bytes.Reader(pre(i))
        rawBytes += rd.readVarLong()
        bodies(i) = java.util.Arrays.copyOfRange(pre(i), rd.pos, pre(i).length)
      }
      i += 1
    }
    val hasNull = bodies.exists(_ == null)
    val inner = {
      val buf = new Bytes.Buf()
      buf.writeByte(ColumnCodec.BwtBin)
      buf.writeVarInt(bodies.length)
      val emptyEnc = graft.codec.Pipelines.textEncode(Array.emptyByteArray)
      bodies.foreach { b =>
        val v = if (b == null) emptyEnc else b // null slot: canonical empty
        buf.writeVarInt(v.length)
        buf.writeBytes(v)
      }
      buf.toArray
    }
    val withNulls = if (!hasNull) inner else {
      val bitmap = new Array[Byte]((bodies.length + 7) / 8)
      var j = 0
      while (j < bodies.length) {
        if (bodies(j) == null) bitmap(j >> 3) = (bitmap(j >> 3) | (1 << (j & 7))).toByte
        j += 1
      }
      val buf = new Bytes.Buf(inner.length + bitmap.length + 8)
      buf.writeByte(ColumnCodec.NullWrap)
      buf.writeVarInt(bodies.length)
      buf.writeBytes(bitmap)
      buf.writeBytes(inner)
      buf.toArray
    }
    val payload = {
      // exact-size precheck: container bodies are mostly already
      // entropy-coded, so the wrap rarely wins — don't pay its encode pass
      val freq = graft.codec.Huffman.histogram(withNulls)
      val lens = graft.codec.Huffman.codeLengths(freq)
      val hSize = graft.codec.Huffman.compressedSize(freq, lens, withNulls.length)
      if (hSize + 1 >= withNulls.length)
        withNulls
      else {
        val huf = graft.codec.Huffman.compressWithSized(withNulls, lens, hSize.toInt)
        val out = new Array[Byte](huf.length + 1)
        out(0) = ColumnCodec.HufWrap.toByte
        System.arraycopy(huf, 0, out, 1, huf.length)
        out
      }
    }
    ColChunk(ColumnCodec.codecName(payload), rawBytes, payload.length.toLong,
      fnv1a(payload), payload)
  }

  /** One chunk row (all five column payloads) of a pre-encoded row slice. */
  private def preEncodedChunkRow(
      pid: Int,
      cid: Int,
      chunk: scala.collection.Seq[PreRow],
      bwtBias: Double
  ): EncodedChunk = {
    val urls = chunk.map { r =>
      require(r._1 != null && r._2 != null, "null url/warc_ts")
      r._1.getBytes(UTF_8)
    }.toArray
    val tss = chunk.map { r =>
      Math.floorDiv(r._2.getTime, 1000L) * 1000000L + r._2.getNanos / 1000L
    }.toArray
    val langs = chunk.map(r => if (r._5 == null) null else r._5.getBytes(UTF_8)).toArray
    def bin(values: Array[Array[Byte]]): ColChunk = {
      val payload = ColumnCodec.encodeBinaryNullable(values, bwtBias)
      ColChunk(ColumnCodec.codecName(payload),
        values.map(v => if (v == null) 0L else v.length.toLong).sum,
        payload.length.toLong, fnv1a(payload), payload)
    }
    val tsPayload = ColumnCodec.encodeLong(tss)
    // chunk is a url-sorted slice, so its url range is (first, last)
    EncodedChunk(pid, cid, chunk.length, chunk.head._1, chunk.last._1,
      url = bin(urls),
      warc_ts = ColChunk(ColumnCodec.codecName(tsPayload), tss.length * 8L,
        tsPayload.length.toLong, fnv1a(tsPayload), tsPayload),
      html = containerizePre(chunk.map(_._3).toArray),
      text = containerizePre(chunk.map(_._4).toArray),
      lang = bin(langs))
  }

  /** Buffering kernel for the pre-encoded path (spillSafeSort = false):
    * groups and sorts in the task heap — one less whole-stage pass, but
    * task memory scales with the partition.
    */
  private[spark] def encodePreEncodedPartition(
      it: Iterator[(String, java.sql.Timestamp, Array[Byte], Array[Byte], String, Int)],
      chunkRows: Int,
      onPartDone: LineageRecord => Unit,
      bwtBias: Double
  ): Iterator[EncodedChunk] = {
    val byPart = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[PreRow]]
    it.foreach { case (url, ts, html, text, lang, pid) =>
      byPart.getOrElseUpdate(pid, scala.collection.mutable.ArrayBuffer.empty) +=
        ((url, ts, html, text, lang))
    }
    byPart.iterator.flatMap { case (pid, rows0) =>
      val rows = sortByUrlUtf8(rows0)(_._1)
      val partChunks = rows.grouped(chunkRows).zipWithIndex.map { case (chunk, cid) =>
        preEncodedChunkRow(pid, cid, chunk, bwtBias)
      }.toVector
      onPartDone(LineageRecord(
        part_id = pid,
        n_rows = rows.length.toLong,
        n_chunks = partChunks.length.toLong,
        bytes_in = partChunks.map(_.bytesIn).sum,
        bytes_out = partChunks.map(_.bytesOut).sum,
        codecs = partChunks.flatMap(_.columns.map { case (n, c) => s"$n=${c.codec}" })
          .distinct.sorted.mkString(","),
        payload_hash = partChunks.map(_.hashXor).foldLeft(0L)(_ ^ _),
        status = "done"
      ))
      partChunks
    }
  }

  /** Streaming kernel for the pre-encoded path (spillSafeSort = true, the
    * default): rows arrive already sorted by (part_id, url) from
    * Catalyst's spillable sort, so the kernel only ever holds one chunk
    * (chunkRows rows) plus O(1) lineage counters — a partition larger
    * than executor memory still encodes. Chunk layout is identical to the
    * buffering kernel (same sort key, same slicing).
    */
  private[spark] def encodePreEncodedSorted(
      it: Iterator[(String, java.sql.Timestamp, Array[Byte], Array[Byte], String, Int)],
      chunkRows: Int,
      onPartDone: LineageRecord => Unit,
      bwtBias: Double
  ): Iterator[EncodedChunk] = new Iterator[Seq[EncodedChunk]] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[PreRow]
    private var curPid = Int.MinValue
    private var cid = 0
    // per-part lineage aggregates
    private var rows = 0L
    private var bytesIn = 0L
    private var bytesOut = 0L
    private var hash = 0L
    private val codecs = scala.collection.mutable.SortedSet.empty[String]
    private var pendingLineagePid = Int.MinValue

    private def flushChunk(): Seq[EncodedChunk] = {
      val c = preEncodedChunkRow(curPid, cid, buf, bwtBias)
      cid += 1
      rows += buf.length
      bytesIn += c.bytesIn
      bytesOut += c.bytesOut
      hash ^= c.hashXor
      c.columns.foreach { case (n, cc) => codecs += s"$n=${cc.codec}" }
      buf.clear()
      Seq(c)
    }

    private def closePart(): Unit = {
      if (curPid != Int.MinValue) {
        onPartDone(LineageRecord(curPid, rows, cid.toLong, bytesIn, bytesOut,
          codecs.mkString(","), hash, "done"))
      }
      cid = 0; rows = 0L; bytesIn = 0L; bytesOut = 0L; hash = 0L; codecs.clear()
    }

    // the third disjunct keeps the iterator alive when input ended exactly
    // on a chunk boundary but the last part's lineage is still unemitted
    def hasNext: Boolean = it.hasNext || buf.nonEmpty || curPid != Int.MinValue

    def next(): Seq[EncodedChunk] = {
      // a part-change append below can leave buf already full (chunkRows==1):
      // flush it first so the fullness invariant (buf.length < chunkRows on
      // entry to the append loop) holds and chunk layout matches the
      // buffering kernel exactly
      if (buf.length >= chunkRows && buf.nonEmpty) return flushChunk()
      while (it.hasNext) {
        val (url, ts, html, text, lang, pid) = it.next()
        if (pid != curPid) {
          if (buf.nonEmpty) {
            val out = flushChunk()
            closePart()
            curPid = pid
            buf += ((url, ts, html, text, lang))
            return out
          }
          closePart()
          curPid = pid
        }
        buf += ((url, ts, html, text, lang))
        if (buf.length >= chunkRows) return flushChunk()
      }
      // input exhausted: flush the tail chunk and close the last part
      val out = if (buf.nonEmpty) flushChunk() else Seq.empty
      closePart()
      curPid = Int.MinValue
      out
    }
  }.flatten

  /** Unsigned UTF-8 byte order for urls — the SAME order Catalyst's
    * UTF8String binary comparison uses, so the buffering kernels and the
    * `spillSafeSort` Tungsten-sorted kernel slice chunks identically even
    * for urls containing supplementary (non-BMP) characters, where Java
    * String UTF-16 order diverges from UTF-8 byte order.
    */
  private[spark] def sortByUrlUtf8[T](
      rows: scala.collection.mutable.ArrayBuffer[T]
  )(url: T => String): scala.collection.mutable.ArrayBuffer[T] = {
    // schwartzian: encode each url to UTF-8 ONCE (sortBy would re-encode
    // both sides on every comparison — O(n log n) transient allocations)
    val keyed = rows.map(r => (url(r).getBytes(UTF_8), r))
    keyed.sortInPlaceWith((x, y) => java.util.Arrays.compareUnsigned(x._1, y._1) < 0)
    keyed.map(_._2)
  }

  /** FNV-1a 64-bit (public domain) — deterministic payload fingerprint. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Partition-local kernel: group rows by part_id (a task can own several
    * after the hash exchange), slice into chunkRows-sized chunks, encode
    * each column independently. Task memory is bounded by the partition's
    * row payload (the full group is buffered for the deterministic by-url
    * sort before chunking), so `numPartitions` is the memory knob —
    * chunkRows only bounds the per-chunk codec working set.
    */
  private[spark] def encodePartitionImpl(
      it: Iterator[(String, java.sql.Timestamp, Array[Byte], String, String, Int)],
      chunkRows: Int,
      onPartDone: LineageRecord => Unit = _ => (),
      bwtBias: Double = 1.0
  ): Iterator[EncodedChunk] = {
    val byPart = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[(String, java.sql.Timestamp, Array[Byte], String, String)]]
    it.foreach { case (url, ts, html, text, lang, pid) =>
      byPart.getOrElseUpdate(pid, scala.collection.mutable.ArrayBuffer.empty) +=
        ((url, ts, html, text, lang))
    }
    byPart.iterator.flatMap { case (pid, rows0) =>
      val rows = sortByUrlUtf8(rows0)(_._1) // deterministic chunk layout (by url, UTF-8 byte order)
      val partChunks = rows.grouped(chunkRows).zipWithIndex.map { case (chunk, cid) =>
        // url and warc_ts are the row identity — must be non-null; the
        // payload columns (html/text/lang) are nullable like real crawl data
        val urls = chunk.map { r =>
          require(r._1 != null && r._2 != null, "null url/warc_ts")
          r._1.getBytes(UTF_8)
        }.toArray
        val tss = chunk.map { r =>
          Math.floorDiv(r._2.getTime, 1000L) * 1000000L + r._2.getNanos / 1000L
        }.toArray
        def nb(s: String): Array[Byte] = if (s == null) null else s.getBytes(UTF_8)
        def bin(values: Array[Array[Byte]]): ColChunk = {
          val payload = ColumnCodec.encodeBinaryNullable(values, bwtBias)
          ColChunk(ColumnCodec.codecName(payload),
            values.map(v => if (v == null) 0L else v.length.toLong).sum,
            payload.length.toLong, fnv1a(payload), payload)
        }
        val tsPayload = ColumnCodec.encodeLong(tss)
        EncodedChunk(pid, cid, chunk.length, chunk.head._1, chunk.last._1,
          url = bin(urls),
          warc_ts = ColChunk(ColumnCodec.codecName(tsPayload), tss.length * 8L,
            tsPayload.length.toLong, fnv1a(tsPayload), tsPayload),
          html = bin(chunk.map(_._3).toArray),
          text = bin(chunk.map(r => nb(r._4)).toArray),
          lang = bin(chunk.map(r => nb(r._5)).toArray))
      }.toVector
      onPartDone(LineageRecord(
        part_id = pid,
        n_rows = rows.length.toLong,
        n_chunks = partChunks.length.toLong,
        bytes_in = partChunks.map(_.bytesIn).sum,
        bytes_out = partChunks.map(_.bytesOut).sum,
        codecs = partChunks.flatMap(_.columns.map { case (n, c) => s"$n=${c.codec}" })
          .distinct.sorted.mkString(","),
        payload_hash = partChunks.map(_.hashXor).foldLeft(0L)(_ ^ _),
        status = "done"
      ))
      partChunks
    }
  }
}

/** Test/bench probe into the partition encode kernel. */
object EncodeJobProbe {
  def encodePartition(
      it: Iterator[(String, java.sql.Timestamp, Array[Byte], String, String, Int)],
      chunkRows: Int
  ): Iterator[EncodedChunk] = EncodeJob.encodePartitionImpl(it, chunkRows)
}
