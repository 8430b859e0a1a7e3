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

/** One-row health snapshot of an encoded table — see [[EncodeJob.describe]]. */
final case class TableHealth(
    n_rows: Long, // rows stored, summed from chunk metadata
    n_chunks: Long,
    n_parts_live: Int, // partition dirs holding at least one chunk
    n_partitions: Int, // layout config from _meta (0 = wiped/absent table)
    salt_factor: Int,
    chunk_rows: Int,
    fragmented_parts: Int, // partitions fragmentedPartIds would select
    pending_swap: Boolean, // interrupted compaction/delete swap awaiting repair
    writer_lease_held: Boolean // a writer currently holds _writer.lock
)

final case class EncodeConfig(
    numPartitions: Int = 32,
    // spreads each url-host over this many partitions. 16 (was 4): on
    // host-skewed crawls one mega-host at salt 4 left the largest
    // partition 24x the median (guide §2.5 calls >5-10x actionable),
    // capping decode/compact concurrency at ~1/2; salt 16 measures
    // 3.5x. The cost is range/prefix reads fanning over 16 instead of 4
    // partition dirs per host — point lookups (exact home partition) are
    // unaffected. Layout config, persisted in _meta like before.
    saltFactor: Int = 16,
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
    // gate on a COMMITTED data file, not directory existence: writeMeta's
    // SaveMode.Overwrite deletes-then-rewrites _meta on every run, so a
    // crash in that window leaves an existing-but-empty dir — treating it
    // as a table would wedge every later run/append/lookup on an
    // unreadable parquet path, when the right reading is "absent, rewrite"
    if (!hasCommittedFileUnder(spark, metaPath(outDir))) None
    else Some(spark.read.parquet(metaPath(outDir)).as[EncodeMeta].head())
  }

  /** A later write to an existing table must use the same partitioning
    * function, or (part_id, chunk_id) identity and lookup pruning break.
    * Returns the meta it read so callers don't pay a second _meta scan.
    */
  private def requireLayoutMatch(
      spark: SparkSession, outDir: String, cfg: EncodeConfig): Option[EncodeMeta] = {
    val meta = readMeta(spark, outDir)
    meta.foreach { m =>
      require(m.numPartitions == cfg.numPartitions && m.saltFactor == cfg.saltFactor,
        s"encoded table at $outDir was written with numPartitions=${m.numPartitions}/" +
          s"saltFactor=${m.saltFactor}; this config says ${cfg.numPartitions}/${cfg.saltFactor}")
    }
    meta
  }

  /** True iff the chunks table has at least one COMMITTED data file
    * (staging junk under _temporary / .spark-staging and marker files do
    * not count) — the "does this encoded table exist yet" test.
    */
  private[spark] def hasCommittedChunks(spark: SparkSession, outDir: String): Boolean =
    hasCommittedFileUnder(spark, chunksPath(outDir))

  private def hasCommittedFileUnder(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
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

  // ---------------------------------------------------------- writer lease

  /** The single-writer lease file. Every write entry point ([[run]]/
    * [[append]]/[[compact]]/[[delete]]/[[upsert]]/
    * [[completePendingCompactSwap]]) holds it for the duration of the
    * call: the engine's write machinery assumes ONE writer (two concurrent
    * appends would read the same chunk-id offsets and collide on
    * `(part_id, chunk_id)`; a compact racing an append can swap away
    * chunks the append deduped against — the optimistic-snapshot-commit
    * protection Iceberg would provide has no emulation here), so
    * concurrent misuse must fail LOUDLY instead of corrupting the table.
    * Readers are not locked (single-writer / multi-reader).
    */
  def writerLockPath(outDir: String) =
    new org.apache.hadoop.fs.Path(outDir, "_writer.lock")

  /** A lease this much older than now is presumed orphaned by a dead
    * writer (the holder releases in a `finally` AND renews the lock's
    * mtime on a heartbeat every third of this interval while the write
    * runs, so only a JVM kill strands one — a healthy multi-hour
    * compaction never reads as stale) and is broken automatically on the
    * next acquisition.
    */
  val StaleWriterLockMs: Long = 30L * 60 * 1000

  /** Tolerance when comparing a file's server-side mtime against this
    * client's clock in the fenced lease break — covers client/namenode
    * clock skew without reopening a meaningful renewal window.
    */
  private val ClockSkewAllowanceMs: Long = 10000

  // reentrancy registry (qualified lock path -> holding thread): upsert's
  // inner delete/append and append's bootstrap run() re-enter the lease
  // they already hold instead of deadlocking on their own lock file
  private val heldLocks = new java.util.concurrent.ConcurrentHashMap[String, Thread]()

  /** Raw lock-file content, retried through transient FS hiccups (a DN
    * blip on release must not strand a healthy table behind a 30-minute
    * staleness wait). None = missing or unreadable after retries. Opens
    * FIRST and reads to EOF — a stat-then-open pair could race a
    * break+re-create and hand back a silently truncated prefix of the new
    * holder's file, which parses as a uuid that matches nobody.
    */
  private def readLockFile(
      fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path
  ): Option[String] = {
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(lock)
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          return Some(new String(bos.toByteArray, UTF_8))
        } finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => return None
        case _: java.io.IOException if attempt < 2 =>
          attempt += 1; Thread.sleep(50)
        case _: java.io.IOException => return None
      }
    }
    None // unreachable
  }

  /** The ONE uuid-line parser — renewal, release, and the fenced break
    * must never disagree about a lock file's ownership format.
    */
  private def parseLockUuid(content: String): Option[String] =
    content.split('\n').find(_.startsWith("uuid=")).map(_.stripPrefix("uuid="))

  /** The acquisition uuid stored in the lock file — ownership proof, so a
    * writer only ever renews/releases ITS OWN lease (never one that an
    * operator force-broke and another writer re-acquired).
    */
  private def readLockUuid(
      fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path
  ): Option[String] =
    readLockFile(fs, lock).flatMap(parseLockUuid)

  /** Manually clear an orphaned writer lease (a crashed writer's lock also
    * goes stale on its own after [[StaleWriterLockMs]]). Returns true if a
    * lock file was removed.
    */
  def breakWriterLock(spark: SparkSession, outDir: String): Boolean = {
    val fs = chunksFs(spark, outDir)
    fs.delete(writerLockPath(outDir), false)
  }

  /** Acquire the writer lease (create-no-overwrite of the lock file —
    * atomic on HDFS; on the local FS it is check-then-create, so a
    * same-instant double-acquire is additionally guarded by the uuid
    * read-back below), run `body`, release. While held, a daemon
    * heartbeat renews the lock's mtime every `StaleWriterLockMs / 3` so a
    * long-running write (a multi-hour corpus compaction) never reads as
    * stale to a contender. Renewal and release are OWNERSHIP-CHECKED: a
    * writer only touches a lock file that still carries its own
    * acquisition uuid, so if an operator force-broke the lease and
    * another writer took it, the first writer's release cannot delete the
    * second's lock. Reentrant per thread. Acquisition of a held lease
    * fails with a named error rather than blocking — the caller's
    * orchestration is wrong, and waiting would only serialize the
    * corruption hazard, not remove it.
    */
  private[graft] def withWriterLock[T](spark: SparkSession, outDir: String)(body: => T): T = {
    val fs = chunksFs(spark, outDir)
    val lock = writerLockPath(outDir)
    val key = fs.makeQualified(lock).toString
    val me = Thread.currentThread()
    if (heldLocks.get(key) eq me) return body // reentrant inner call
    // in-JVM gate FIRST (putIfAbsent is atomic): two threads of one JVM
    // contending for the same table serialize here exactly, never
    // reaching the FS create — which on the local FS is check-then-create
    // and only probabilistically guarded by the uuid read-back. The lock
    // FILE remains the cross-JVM guard (create-no-overwrite is atomic on
    // HDFS). A force-broken lease does NOT abort the in-flight body (a
    // running Spark job can't be safely interrupted from a heartbeat);
    // ownership-checked renewal/release merely keeps that writer from
    // ever touching the new holder's lock.
    val prev = heldLocks.putIfAbsent(key, me)
    if (prev != null)
      throw new IllegalStateException(
        s"another writer holds the lease on encoded table $outDir " +
          s"[in-process thread ${prev.getName}]: concurrent writes are unsupported")
    val uuid = java.util.UUID.randomUUID().toString
    // the in-JVM entry is ours from the putIfAbsent above until the
    // OUTERMOST finally below: any failure path that leaked it would make
    // this thread's next call take the reentrant fast path and write
    // without the FS lock at all, while locking every other thread of the
    // JVM out of the table forever (the 30-min staleness self-heal never
    // runs because the in-JVM gate throws before the FS path is reached)
    try {
      def tryAcquire(attempt: Int = 0): Boolean =
        try {
          fs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
          val out = fs.create(lock, false) // fails if the file exists
          out.write((s"app=${spark.sparkContext.applicationId} thread=${me.getName} " +
            s"ts=${System.currentTimeMillis()}\nuuid=$uuid\n").getBytes(UTF_8))
          out.close()
          // read-back closes the stale-break race: if another contender
          // replaced the file between our create and here, back off
          // (without deleting THEIR lock)
          readLockUuid(fs, lock) match {
            case Some(u) => u == uuid
            case None =>
              // unreadable content: EITHER our own write was lost (the
              // file is a stranded, never-heartbeated lock that would
              // block the table for the whole staleness window) OR — on
              // the local FS, where create(false) is check-then-create —
              // a racing contender is mid-write over the same path.
              // Distinguish by PERSISTENCE: any in-flight write settles
              // in milliseconds, so pause and re-read; readable content
              // then names the winner (deleting here would remove the
              // contender's VALID lock and double-acquire the lease).
              // Only a persistently unreadable file is stranded junk.
              Thread.sleep(3000)
              readLockUuid(fs, lock) match {
                case Some(u) => u == uuid
                case None =>
                  try fs.delete(lock, false) catch { case _: java.io.IOException => () }
                  attempt == 0 && tryAcquire(attempt + 1)
              }
          }
        } catch { case _: java.io.IOException => false }
      var acquired = tryAcquire()
      if (!acquired) {
        // the verdict is formed on BOTH the mtime and the content of the
        // lock: content (the acquisition uuid is random per lease) is the
        // rename-mechanism-independent identity used to re-check the
        // capture below — mtime would misjudge on object stores whose
        // rename is copy-based and refreshes timestamps
        val seenContent = readLockFile(fs, lock)
        val stale =
          try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime > StaleWriterLockMs
          catch { case _: java.io.FileNotFoundException => true } // holder just released
        if (stale) {
          // FENCED break: rename the stale file aside instead of deleting
          // it — rename is atomic, so of several contenders exactly one
          // captures the file. But the rename captures whatever the lock
          // IS at that instant, which may no longer be the file the
          // staleness verdict was formed on (another contender can break
          // and re-CREATE, or the judged holder's stalled heartbeat can
          // revive, in our check-to-rename window). The break stands only
          // if BOTH hold for the capture:
          //  - content identity: byte-equal to the judged file (uuid is
          //    random per lease; an unreadable judged file must capture
          //    unreadable too). Rename-mechanism-independent.
          //  - verdict stability: the aside's mtime is still stale
          //    (rename-mtime-preserving backends: a revival's setTimes
          //    shows as a FRESH preserved mtime -> undo) OR is the rename
          //    itself (copy-based-rename backends refresh mtime to now;
          //    >= our rename start minus clock-skew allowance carries no
          //    renewal signal, and rejecting it would permanently disable
          //    self-heal there — a revival landing inside the copy or the
          //    skew allowance is the residual, accepted window: a holder
          //    silent for 30 minutes whose revival misses a ~10 s race,
          //    which the pre-fence break broke unconditionally).
          // Anything else is somebody's live lease: renamed straight back.
          val aside = new org.apache.hadoop.fs.Path(outDir, s"_writer.lock.stale.$uuid")
          val renameStart = System.currentTimeMillis()
          val broke = try fs.rename(lock, aside) catch { case _: java.io.IOException => false }
          val keepBreak = broke && readLockFile(fs, aside) == seenContent && {
            try {
              val m = fs.getFileStatus(aside).getModificationTime
              System.currentTimeMillis() - m > StaleWriterLockMs ||
                m >= renameStart - ClockSkewAllowanceMs
            } catch { case _: java.io.IOException => false }
          }
          if (broke && !keepBreak) {
            // we yanked a live lease: restore it. If the slot was already
            // re-taken by a third contender the restore fails — leave the
            // aside in place rather than deleting the yanked holder's
            // lease record (it ages into the staleness-gated sweep), and
            // do not acquire.
            try { fs.rename(aside, lock); () }
            catch { case _: java.io.IOException => () }
          } else {
            if (keepBreak) { try fs.delete(aside, false) catch { case _: java.io.IOException => () } }
            // whether or not our rename won: retry the create — either the
            // winner hasn't re-created yet (we race it through
            // create-no-overwrite + uuid read-back, at most one survives)
            // or it has and our create fails cleanly
            acquired = tryAcquire()
          }
        }
      }
      if (!acquired) {
        val holder = readLockFile(fs, lock).map(_.replace('\n', ' ')).getOrElse("unreadable")
        throw new IllegalStateException(
          s"another writer holds the lease on encoded table $outDir [$holder]: " +
            "concurrent writes are unsupported (chunk-id allocation and the _SWAP " +
            "machinery assume a single writer) — if the holder is dead, " +
            "EncodeJob.breakWriterLock clears the lease (it also goes stale after " +
            s"${StaleWriterLockMs / 60000} min without heartbeat renewal)")
      }
      // the FS lease is ours: everything from here on runs under the
      // release finally, so even a thread-exhausted renewer creation or a
      // non-IO sweep failure cannot strand the lock file
      try {
        // sweep aside-files orphaned by a breaker that crashed between its
        // rename and delete (or whose live-lease restore lost the slot) —
        // clutter that would accumulate on a table written for years.
        // STALENESS-GATED: the files that must NOT be swept are captures
        // of a LIVE lease awaiting restore, and those read fresh on every
        // backend (preserve-rename keeps the heartbeat-renewed mtime;
        // copy-rename refreshes to now). A stale-mtime aside can only be
        // a dead writer's record — on preserve-rename backends that
        // includes a contender's in-flight capture of a STALE lock, whose
        // deletion is harmless: we hold the lease, so that contender's
        // acquisition fails (correctly) either way.
        try fs.listStatus(new org.apache.hadoop.fs.Path(outDir)).toSeq
          .filter(s => s.getPath.getName.startsWith("_writer.lock.stale.") &&
            System.currentTimeMillis() - s.getModificationTime > StaleWriterLockMs)
          .foreach(s => fs.delete(s.getPath, false))
        catch { case _: java.io.IOException => () }
        // per-lease daemon renewer (not a shared single-thread pool): one
        // renewal hanging on a stalled FS call must not starve the
        // heartbeat of every OTHER lease this JVM holds — a healthy
        // multi-hour write on a healthy table would read as stale because
        // an unrelated namenode hung. Leases are per-write-call, so one
        // short-lived thread each is cheap; shutdownNow also interrupts an
        // in-flight hung renewal rather than letting cancel(false) leave
        // it running forever.
        val renewer =
          java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
            val t = new Thread(r, s"graft-writer-lease-renewer-$uuid"); t.setDaemon(true); t
          })
        try {
          renewer.scheduleAtFixedRate(() => {
            try if (readLockUuid(fs, lock).contains(uuid))
              fs.setTimes(lock, System.currentTimeMillis(), -1)
            catch { case _: Throwable => () } // renewal is best-effort
          }, StaleWriterLockMs / 3, StaleWriterLockMs / 3, java.util.concurrent.TimeUnit.MILLISECONDS)
          body
        } finally renewer.shutdownNow()
      } finally {
        // release unless the lock is provably NOT ours: a readable file
        // carrying another uuid — or carrying NO uuid line at all (a
        // foreign fence file, or another writer's partially-visible
        // create after our lease was force-broken) — stays. A missing or
        // unreadable-after-retries lock is released: refusing would
        // strand the common success path behind a 30-minute staleness
        // wait on a transient read hiccup, while the misdelete it risks
        // needs a force-break of OUR lease (>30 min heartbeat stall) to
        // coincide with a persistent read failure outlasting the retries.
        val foreign =
          readLockFile(fs, lock).exists(c => !parseLockUuid(c).contains(uuid))
        if (!foreign)
          try fs.delete(lock, false) catch { case _: java.io.IOException => () }
      }
    } finally heldLocks.remove(key)
  }

  /** The one chunk-parquet writer configuration — shared by every path
    * that writes chunk rows (bootstrap, append, compaction/delete staging)
    * so the physical format cannot silently diverge between them.
    */
  private def writeChunks(
      df: DataFrame,
      path: String,
      mode: SaveMode,
      dynamicPartitionOverwrite: Boolean = false
  ): Unit = {
    val w = df.write.mode(mode)
      .option("parquet.enable.dictionary", "false") // payloads are ~MB blobs
      .option("parquet.block.size", (16 * 1024 * 1024).toString) // bound writer memory
      .option("compression", "none") // payloads are already codec-compressed
    // writer-scoped, NOT spark.conf.set: mutating the session conf would
    // silently change the semantics of the caller's own later overwrites
    (if (dynamicPartitionOverwrite) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("part_id")
      .parquet(path)
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
  ): Dataset[LineageRecord] = withWriterLock(spark, outDir) {
    import spark.implicits._

    requireLayoutMatch(spark, outDir, cfg)
    completePendingCompactSwap(spark, outDir)
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

    writeChunks(chunks.toDF(), chunksPath(outDir), SaveMode.Overwrite,
      dynamicPartitionOverwrite = true)

    import scala.jdk.CollectionConverters._
    // distinct: stage retries can double-add; records are deterministic
    val records = acc.value.asScala.toSeq.distinct
    if (records.nonEmpty) {
      // coalesce(1): O(partitions) tiny rows — one task, one file (the
      // default-parallelism write paid a 32-task job + a 32-file lineage
      // dir that every later lineage read re-listed)
      spark.createDataset(records).coalesce(1)
        .write.mode(SaveMode.Append).parquet(lineagePath(outDir))
    }
    // return THIS run's records; the full table lives at lineagePath
    spark.createDataset(records)
  }

  def compactTmpPath(outDir: String) = chunksPath(outDir) + "_compact_tmp"
  private def swapMarkerPath(outDir: String) =
    new org.apache.hadoop.fs.Path(compactTmpPath(outDir), "_SWAP")

  private def chunksFs(spark: SparkSession, outDir: String) =
    new org.apache.hadoop.fs.Path(chunksPath(outDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Rewrite partitions into fresh optimal layout: re-sort each selected
    * partition's rows by url, re-slice into full chunkRows chunks, and swap
    * the partition directories — the table-maintenance pass that undoes
    * append fragmentation. After N appends a partition holds up to N
    * generations of small tail chunks; lookups then probe several
    * range-overlapping chunks per url and scans pay per-file overhead.
    * Compaction restores the bootstrap layout invariants: one url-sorted
    * chunk sequence per partition with disjoint url ranges. Decode output
    * is bit-identical before vs after; lineage rows of compacted
    * partitions are REPLACED so metrics reflect the new layout.
    *
    * Plan shape — NO exchange, and (by default) NO re-compression:
    *  - each selected partition directory is scanned as its own coalesced
    *    single-task branch of a union (every page already sits in its home
    *    partition — part_id is a pure row function — so there is nothing
    *    to shuffle; the old implementation re-ran the full encode pipeline
    *    and paid an exchange of every decoded payload);
    *  - within a task, the stored per-value compressed bodies of text/html
    *    are EXTRACTED from their containers and re-containerized as-is
    *    ([[ColumnCodec.extractBwtBodies]]): both the per-value encoder and
    *    the container are deterministic, so the result is byte-identical
    *    to a fresh encode of the same rows while skipping all BWT/SA work
    *    — compaction costs about as much as a decode, not an encode.
    *    `reencode = true` forces the decode + re-encode path instead (use
    *    after changing `bwtBias`, to re-run the per-value codec policy).
    *    Caveat: body reuse applies to per-value (BwtBin-container)
    *    payloads — the `mapSidePreEncode = true` default. A table built
    *    with `mapSidePreEncode = false` whose chunk-level policy picked
    *    Dict/Rle/Fsst for text/html falls back to decode + per-value
    *    re-encode for those chunks, converting them to the per-value form
    *    (full BWT cost for them, and the chunk-level codec choice is not
    *    re-run — decode stays bit-identical, compressed size may differ);
    *  - the narrow spillable `sortWithinPartitions` + the streaming kernel
    *    keep task memory at O(chunkRows) even for an oversized partition.
    *
    * Crash safety (write-ahead staging, never in-place): new chunks are
    * written to `chunks_compact_tmp`; only after that write fully commits
    * is a `_SWAP` marker (listing the part ids) created and the partition
    * directories swapped one rename at a time, then lineage is recomputed
    * and the staging dir removed. A crash BEFORE the marker leaves the
    * live table untouched (stale staging is discarded on the next write);
    * a crash AFTER it is rolled forward — the marker proves the staging
    * dir is complete — by [[completePendingCompactSwap]], which every
    * write entry point runs first. Readers fail fast on a pending marker
    * ([[requireNoPendingSwap]]) instead of silently seeing a half-swapped
    * table.
    */
  def compact(
      spark: SparkSession,
      outDir: String,
      cfg: EncodeConfig = EncodeConfig(),
      partIds: Option[Seq[Int]] = None,
      reencode: Boolean = false
  ): Dataset[LineageRecord] = withWriterLock(spark, outDir) {
    import spark.implicits._
    val meta = requireLayoutMatch(spark, outDir, cfg)
    completePendingCompactSwap(spark, outDir)

    // re-slice with the STORED chunkRows (the layout the table was built
    // with and fragmentedPartIds measures against) — compacting with a
    // caller's divergent chunkRows would rewrite the table into a layout
    // the selection metric permanently disagrees with (every partition
    // reads as fragmented forever, and an in-stream compaction hook would
    // re-compact the whole table on every interval without converging)
    val effCfg = meta.map(m => cfg.copy(chunkRows = m.chunkRows)).getOrElse(cfg)

    val fs = chunksFs(spark, outDir)
    val root = new org.apache.hadoop.fs.Path(chunksPath(outDir))
    val present: Seq[Int] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("part_id="))
        .map(_.getPath.getName.stripPrefix("part_id=").toInt)
        .sorted
    val selected: Seq[Int] = partIds match {
      case Some(ps) => present.filter(ps.toSet)
      case None => present
    }
    if (selected.isEmpty) return spark.emptyDataset[LineageRecord]

    val compacted = compactedChunkStream(spark, outDir, effCfg, selected, reencode)

    // --- stage, then swap; never overwrite the live partition dirs in place
    val tmp = new org.apache.hadoop.fs.Path(compactTmpPath(outDir))
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale pre-marker staging
    writeChunks(compacted.toDF(), compactTmpPath(outDir), SaveMode.Overwrite)

    // staging is fully committed; write the swap intent (part id list) —
    // from here on the swap completes even across a crash (roll-forward)
    // compaction never empties a partition: every selected part's staged
    // output must exist before the swap intent is recorded
    selected.foreach { pid =>
      require(fs.exists(new org.apache.hadoop.fs.Path(compactTmpPath(outDir), s"part_id=$pid")),
        s"staged output missing for part $pid — refusing to swap")
    }
    writeSwapMarker(fs, outDir, selected.map(p => (p, false)))

    val records = finishSwap(spark, outDir, selected.map(p => (p, false)))
    spark.createDataset(records)
  }

  /** Driver-side url-list bound for [[delete]]/[[upsert]]: the url set is
    * broadcast to the rewrite tasks and mapped to home partitions on the
    * driver, so it must stay modest. Corpus-scale removals should batch
    * (each call is idempotent), and bulk refresh pipelines should prefer
    * partition rebuilds.
    */
  val MaxDeleteUrls = 100000

  /** Remove `urls` from the table — the lifecycle's missing verb (takedown
    * and data-subject-removal requests are routine against a web corpus).
    * Partition-local like [[compact]]: only each url's HOME partition is
    * rewritten (and only if one of its chunks' `[url_min, url_max]` ranges
    * actually covers the url — deleting absent urls is a no-op that
    * touches nothing), via the same exchange-free body-reuse pipeline with
    * the urls filtered out between extract and re-slice. A partition whose
    * every row is deleted is removed outright (chunk dir + lineage row).
    * Crash-safe through the same staging + `_SWAP` + roll-forward
    * machinery ("pid:drop" marker entries record intentional removals).
    * After a delete, re-ingesting the same url (append/stream) stores it
    * again — deletion makes the url absent, not banned.
    */
  def delete(
      spark: SparkSession,
      outDir: String,
      urls: Seq[String],
      cfg: EncodeConfig = EncodeConfig()
  ): Dataset[LineageRecord] = withWriterLock(spark, outDir) {
    import spark.implicits._
    val distinctUrls = urls.distinct
    require(distinctUrls.size <= MaxDeleteUrls,
      s"delete is bounded at $MaxDeleteUrls distinct urls per call " +
        s"(got ${distinctUrls.size}); batch larger removals")
    val meta = requireLayoutMatch(spark, outDir, cfg)
    completePendingCompactSwap(spark, outDir)
    if (distinctUrls.isEmpty || !hasCommittedChunks(spark, outDir))
      return spark.emptyDataset[LineageRecord]
    val effCfg = meta.map(m => cfg.copy(chunkRows = m.chunkRows)).getOrElse(cfg)

    val affected = presentHomeParts(spark, outDir, distinctUrls, meta)
    if (affected.isEmpty) return spark.emptyDataset[LineageRecord]

    val urlSet = distinctUrls.toSet
    val rewritten = compactedChunkStream(
      spark, outDir, effCfg, affected, reencode = false, dropUrls = urlSet)

    val fs = chunksFs(spark, outDir)
    val tmp = new org.apache.hadoop.fs.Path(compactTmpPath(outDir))
    if (fs.exists(tmp)) fs.delete(tmp, true)
    writeChunks(rewritten.toDF(), compactTmpPath(outDir), SaveMode.Overwrite)

    // a partition with no staged output was fully emptied by the delete —
    // record the intent as a drop so roll-forward removes it too
    val actions = affected.map { pid =>
      (pid, !fs.exists(new org.apache.hadoop.fs.Path(compactTmpPath(outDir), s"part_id=$pid")))
    }
    writeSwapMarker(fs, outDir, actions)
    val records = finishSwap(spark, outDir, actions)
    spark.createDataset(records)
  }

  /** Home partitions that ACTUALLY contain at least one of `distinctUrls`.
    * Convenience wrapper over [[presentHomePairs]]. */
  private def presentHomeParts(
      spark: SparkSession,
      outDir: String,
      distinctUrls: Seq[String],
      meta: Option[EncodeMeta]
  ): Seq[Int] =
    presentHomePairs(spark, outDir, distinctUrls, meta).map(_._1).distinct.sorted

  /** The (partition, url) pairs for every url in `distinctUrls` that is
    * ACTUALLY stored — i.e. where each url lives right now. The chunk url
    * ranges alone over-approximate (a range can straddle an absent url),
    * so the urls of range-covering chunks are decoded — the url payload
    * leaf only, exactly append's dedupe scan — making delete-of-absent a
    * true no-op (routine for redelivered takedown batches: re-running a
    * delete must not rewrite anything). The home-partition constraint
    * applies only when the STORED meta is available — computing it from
    * the caller's cfg on a pre-meta table could map a url to the wrong
    * partition and silently skip it. With meta, the home part ids are
    * known driver-side, so the scan itself is partition-pruned to the
    * home dirs (the join condition alone would not push down as a
    * PartitionFilter). Shared by [[delete]] and [[upsert]] (which homes
    * replacement rows at the STORED location, so per-url atomicity holds
    * even on a pre-meta table whose layout disagrees with the caller's
    * cfg). Driver-side result, bounded by the callers' url caps.
    */
  private def presentHomePairs(
      spark: SparkSession,
      outDir: String,
      distinctUrls: Seq[String],
      meta: Option[EncodeMeta]
  ): Seq[(Int, String)] = {
    import spark.implicits._
    val (covering, targets) = presenceScan(spark, outDir, distinctUrls, meta)
    val stored = covering.select($"part_id", $"payload").as[(Int, Array[Byte])]
      .flatMap { case (pid, p) =>
        ColumnCodec.decodeBinary(p).iterator.map(b => (pid, new String(b, UTF_8)))
      }.toDF("part_id", "url")
    stored.join(targets,
        stored("url") === $"d_url" && ($"d_part".isNull || stored("part_id") === $"d_part"),
        "left_semi")
      .select($"part_id", $"url").distinct().as[(Int, String)].collect().toSeq.sorted
  }

  /** The range-covering chunk rows (url payload leaf only) for a presence
    * check, plus the `(d_url, d_part)` targets they were joined against.
    * `private[graft]` so the join-strategy contract below is pinnable by a
    * plan-shape spec without executing a delete.
    */
  private[graft] def presenceScan(
      spark: SparkSession,
      outDir: String,
      distinctUrls: Seq[String],
      meta: Option[EncodeMeta]
  ): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val (targets, homePids) = meta match {
      case Some(m) =>
        val homeCfg = EncodeConfig(numPartitions = m.numPartitions, saltFactor = m.saltFactor)
        // evaluate partIdCol ONCE, driver-side (lookupUrls' pattern): the
        // pairs feed both the join targets and the scan's partition filter
        val pairs = distinctUrls.toDF("url")
          .withColumn("part_id", partIdCol(homeCfg))
          .as[(String, Int)].collect()
        (spark.createDataset(pairs.toIndexedSeq).toDF("d_url", "d_part"),
          Some(pairs.map(_._2).distinct.toSeq))
      case None =>
        (distinctUrls.toDF("url")
          .select($"url".as("d_url"), lit(null).cast("int").as("d_part")), None)
    }
    val urlChunks = {
      val scan = spark.read.parquet(chunksPath(outDir))
      homePids.fold(scan)(ps => scan.filter($"part_id".isin(ps: _*)))
    }.select($"part_id", $"url_min", $"url_max", $"url.payload".as("payload"))
    // meta known -> every target has its home pid, so part_id is a plain
    // EQUI key and the range test a residual: Catalyst plans a (broadcast)
    // hash join where each chunk row scans only ITS partition's urls —
    // O(urls/P) per chunk, vs O(all urls) under a nested-loop join. The
    // previous folded form (`d_part.isNull || part_id === d_part`) got the
    // SAME hash join, but only because d_part's non-nullable Int schema
    // let Catalyst constant-fold the isNull — a schema-incidental
    // property (any target construction that makes d_part nullable would
    // silently degrade the join to nested-loop). The explicit split makes
    // the equi-key contract visible, spec-pinned, and independent of
    // nullability inference; the range-only form survives solely for
    // pre-meta legacy tables (PresenceAb measured the two shapes at plan
    // parity on meta tables, as expected for identical physical plans).
    val range = $"d_url" >= $"url_min" && $"d_url" <= $"url_max"
    val covering =
      if (homePids.isDefined)
        urlChunks.join(targets, col("part_id") === $"d_part" && range, "left_semi")
      else urlChunks.join(targets, range, "left_semi")
    (covering, targets)
  }

  /** Distinct-url ceiling for one [[upsert]] call. Above [[MaxDeleteUrls]]
    * the url set is split into hash groups upserted one at a time (each
    * group's delete+insert is idempotent and per-url atomic), so a
    * backlogged catch-up micro-batch under `newestWins` streaming degrades
    * to more groups instead of permanently failing the query; past THIS
    * ceiling the refresh is a bulk rebuild in disguise and fails loudly
    * (rebuild the affected partitions with [[run]] instead).
    */
  val MaxUpsertUrls: Int = 20 * MaxDeleteUrls

  /** Test seam: observes upsert's commit phases ("staged" = rewrite fully
    * staged, marker not yet written; "swapped" = replaced urls live, tail
    * append still pending). Specs use it to read the table mid-upsert and
    * to inject crashes between the phases.
    */
  private[graft] var upsertPhaseHook: String => Unit = _ => ()

  // test seams: shrink the bound/group size so the error path and the
  // hash-group split run at spec scale (production constants are 100k/2M)
  private[graft] var maxUpsertUrlsForTest: Option[Int] = None
  private[graft] var upsertGroupSizeForTest: Option[Int] = None

  /** Explicit newest-wins refresh — the escape hatch from [[append]]'s
    * INSERT-ONLY semantics: the stored versions of the delta's urls are
    * replaced by the delta's rows regardless of what was stored.
    *
    * Atomic per url (old-or-new, never neither): the replacement does NOT
    * go through separate delete-then-append commits — the affected home
    * partitions are rewritten (stored rows minus the delta's urls, PLUS
    * the delta's rows homed there) into the write-ahead staging dir and
    * swapped in through ONE `_SWAP` commit, so a concurrent reader sees a
    * refreshed url's old version until the swap and its new version after
    * it. Delta rows homed in untouched partitions are brand-new urls
    * there and land as a plain [[append]] afterwards (absent -> present).
    * A crash anywhere is repaired by the usual roll-forward plus
    * re-running the same upsert (idempotent: already-replaced urls
    * rewrite byte-identically, already-landed inserts dedupe away).
    *
    * Bounded at [[MaxUpsertUrls]] distinct urls, enforced BEFORE any
    * driver-side url collect; beyond [[MaxDeleteUrls]] the work is split
    * into hash groups of at most that size.
    */
  def upsert(
      spark: SparkSession,
      delta: Dataset[Page],
      outDir: String,
      cfg: EncodeConfig = EncodeConfig()
  ): Dataset[LineageRecord] = withWriterLock(spark, outDir) {
    import spark.implicits._
    requireLayoutMatch(spark, outDir, cfg)
    completePendingCompactSwap(spark, outDir)
    // persist once: every later step (bound check, url collect, delta
    // encode, rest split/append) re-reads the deduped delta — without
    // this, each one re-runs the dedupe window AND re-scans the source
    val deduped = dedupeDelta(delta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bound BEFORE collecting urls to the driver: the limit caps what
      // the count materializes, so an oversized delta fails loudly
      // instead of OOMing the driver on the way to the bound check
      val ceiling = maxUpsertUrlsForTest.getOrElse(MaxUpsertUrls)
      val groupSize = upsertGroupSizeForTest.getOrElse(MaxDeleteUrls)
      val nUrls = deduped.select($"url").limit(ceiling + 1).count()
      require(nUrls <= ceiling,
        s"upsert is bounded at $ceiling distinct urls per call (delta has more): " +
          "a refresh this size is a bulk rebuild — re-encode the affected partitions " +
          "with run() instead")
      if (nUrls == 0) spark.emptyDataset[LineageRecord]
      else if (nUrls <= groupSize) upsertGroup(spark, deduped, outDir, cfg)
      else {
        // hash-group the urls (never collected as one set): each group is
        // a full, per-url-atomic upsert; /2 headroom keeps every group
        // under the bound despite hash imbalance
        val groups = math.ceil(nUrls.toDouble / math.max(1, groupSize / 2)).toInt
        val touched = (0 until groups).flatMap { g =>
          upsertGroup(spark,
            deduped.filter(pmod(xxhash64($"url"), lit(groups)) === g), outDir, cfg)
            .select($"part_id").as[Int].collect().toSeq
        }.distinct.sorted
        // per-group records mix ABSOLUTE swap rows (full-partition
        // recomputes) with INCREMENTAL append rows (this group's added
        // rows only), so no single group's record is the final word for a
        // partition several groups touched — recompute every touched
        // partition from the live chunk metadata (the same aggregation
        // finishSwap uses), which is layout-final by construction
        spark.createDataset(lineageFromChunks(spark, outDir, touched))
      }
    } finally { deduped.unpersist(); () }
  }

  /** One bounded upsert group: staged partition rewrite-with-replacement +
    * single swap, then the pure-insert tail. `deduped` must already be
    * intra-delta deduplicated and hold at most [[MaxDeleteUrls]] distinct
    * urls.
    */
  private def upsertGroup(
      spark: SparkSession,
      deduped: Dataset[Page],
      outDir: String,
      cfg: EncodeConfig
  ): Dataset[LineageRecord] = {
    import spark.implicits._
    val meta = requireLayoutMatch(spark, outDir, cfg)
    // bootstrap / wiped table: nothing stored to replace — plain append
    if (!hasCommittedChunks(spark, outDir))
      return append(spark, deduped, outDir, cfg)
    val urls = deduped.select($"url").as[String].collect().toSeq
    require(urls.size <= MaxDeleteUrls,
      s"internal: upsert group exceeded $MaxDeleteUrls urls (${urls.size})")
    if (urls.isEmpty) return spark.emptyDataset[LineageRecord]
    val effCfg = meta.map(m => cfg.copy(chunkRows = m.chunkRows)).getOrElse(cfg)
    val pairs = presentHomePairs(spark, outDir, urls, meta)
    // no url stored anywhere: the whole delta is a pure insert
    if (pairs.isEmpty) return append(spark, deduped, outDir, cfg)
    val affected = pairs.map(_._1).distinct.sorted
    // each stored url's replacement row is homed at its STORED partition
    // (on a meta table that IS partIdCol's home; on a pre-meta table whose
    // layout disagrees with cfg it is the only location that keeps the
    // per-url old-or-new guarantee — the swap that removes the old copy
    // must be the commit that introduces the new one). A url stored in
    // several partitions (foreign-layout appends) is replaced at the
    // lowest and dropped from the rest.
    val storedHome: Map[String, Int] =
      pairs.groupBy(_._2).map { case (u, ps) => (u, ps.map(_._1).min) }
    // columnar split on the tiny broadcast (url -> stored home) table:
    // the delta rows stay Tungsten (html — most of the bytes — is never
    // deserialized just to probe a url set)
    val homeDf = broadcast(
      spark.createDataset(storedHome.toSeq).toDF("url", "part_id"))

    // --- phase 1: encode the delta rows that replace stored urls into a
    // TEMP chunk table, ids tagged past UpsertDeltaChunkBase so the
    // rewrite below can tell replacement rows from stored ones
    val fs = chunksFs(spark, outDir)
    val inAffected = deduped.join(homeDf, Seq("url"))
      .select("url", "warc_ts", "html", "text", "lang", "part_id")
    val deltaTmp = chunksPath(outDir) + "_upsert_delta_tmp"
    val deltaTmpPath = new org.apache.hadoop.fs.Path(deltaTmp)
    if (fs.exists(deltaTmpPath)) fs.delete(deltaTmpPath, true) // stale crash junk
    writeChunks(
      encodeChunkStream(inAffected, effCfg, _ => ())
        .map(c => c.copy(chunk_id = c.chunk_id + UpsertDeltaChunkBase))
        .toDF(),
      deltaTmp, SaveMode.Overwrite)

    // --- phase 2: staged rewrite of each affected partition from
    // (stored rows minus the delta's urls) UNION (the delta's rows), in
    // ONE url-sorted re-slice — the staged output is a perfectly
    // laid-out partition (upsert DEFRAGMENTS what it touches instead of
    // appending tail chunks), never touching the live dirs
    val tmp = new org.apache.hadoop.fs.Path(compactTmpPath(outDir))
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val rewritten = compactedChunkStream(
      spark, outDir, effCfg, affected, reencode = false,
      dropUrls = urls.toSet, deltaDir = Some(deltaTmp))
    writeChunks(rewritten.toDF(), compactTmpPath(outDir), SaveMode.Overwrite)
    upsertPhaseHook("staged")

    // every affected part normally has staged content (each holds >= 1
    // replaced url, whose delta row is homed right there); the one
    // exception is a foreign-layout duplicate partition whose every row
    // was a dropped copy — recorded as a drop. Computed from the staging
    // dir so the marker records what is actually on disk.
    val actions = affected.map { pid =>
      (pid, !fs.exists(new org.apache.hadoop.fs.Path(compactTmpPath(outDir), s"part_id=$pid")))
    }
    writeSwapMarker(fs, outDir, actions)
    upsertPhaseHook("marked")
    val swapRecords = finishSwap(spark, outDir, actions)
    upsertPhaseHook("swapped")
    // the delta temp table is only an input to the (now committed) swap;
    // an orphan from a crash before this point is cleared by the next
    // upsert's stale-junk delete above
    if (fs.exists(deltaTmpPath)) fs.delete(deltaTmpPath, true)

    // --- phase 3: delta rows whose urls are stored NOWHERE are brand-new
    // — plain incremental append (absent -> present per url)
    val rest = deduped.join(homeDf.select("url"), Seq("url"), "left_anti")
      .select("url", "warc_ts", "html", "text", "lang").as[Page]
    val restRecords =
      if (rest.isEmpty) Seq.empty
      else append(spark, rest, outDir, cfg).collect().toSeq
    spark.createDataset(swapRecords ++ restRecords)
  }

  /** The swap marker is the roll-forward COMMIT RECORD — it must appear
    * atomically or not at all, never truncated: a token cut mid-`:drop`
    * would make the repair path misparse (wedging every entry point) and
    * an empty marker would silently discard a fully-staged rewrite. So the
    * content is written to a `_SWAP.tmp` sibling first and `fs.rename`d
    * into place (atomic on local FS and HDFS), and it carries a trailing
    * `;` terminator sentinel — a marker missing the sentinel is provably
    * not a committed intent (the rename never happened or a legacy/corrupt
    * file) and is treated as pre-marker staging junk: discarded, live
    * table canonical.
    */
  private def writeSwapMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      outDir: String,
      actions: Seq[(Int, Boolean)]
  ): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(compactTmpPath(outDir), "_SWAP.tmp")
    val out = fs.create(tmp, true)
    out.write((actions.map { case (p, drop) => if (drop) s"$p:drop" else s"$p" }
      .mkString(",") + ";").getBytes(UTF_8))
    out.close()
    if (fs.exists(swapMarkerPath(outDir))) fs.delete(swapMarkerPath(outDir), false)
    require(fs.rename(tmp, swapMarkerPath(outDir)),
      s"failed to commit swap marker at ${swapMarkerPath(outDir)}")
  }

  /** The exchange-free compaction pipeline (separated so tests can assert
    * on its plan): one coalesced single-task scan branch per partition
    * directory — all of a part's chunks land in one task with NO exchange
    * (a plain scan would split/merge tasks across part boundaries; a
    * repartition would shuffle) — then the narrow extract + spillable
    * in-partition sort + streaming kernel.
    */
  /** Chunk ids at or above this mark a row as coming from an upsert's
    * DELTA temp table inside [[compactedChunkStream]] (its replacement
    * rows must survive the `dropUrls` filter that removes their stored
    * generation). Live tables never reach this id: rewrites reset ids to
    * 0 and appends offset from max+1, so crossing it would take ~2.7e8
    * chunk generations in one partition.
    */
  private[graft] val UpsertDeltaChunkBase: Int = 1 << 28

  private[graft] def compactedChunkStream(
      spark: SparkSession,
      outDir: String,
      cfg: EncodeConfig,
      selected: Seq[Int],
      reencode: Boolean,
      dropUrls: Set[String] = Set.empty,
      deltaDir: Option[String] = None
  ): Dataset[EncodedChunk] = {
    import spark.implicits._
    require(selected.nonEmpty, "compactedChunkStream needs at least one partition")
    val fs = chunksFs(spark, outDir)
    val leafSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.Encoders.product[EncodedChunk].schema
        .filterNot(_.name == "part_id"))
    // balanced union tree: a left-deep reduce would recurse O(selected)
    // deep through analysis (stack risk at corpus-scale partition counts);
    // the per-branch driver listing cost stays O(selected) — which is why
    // fragmentedPartIds-driven selection, not full-table compaction, is
    // the intended steady-state maintenance call
    def balancedUnion(dfs: Seq[DataFrame]): DataFrame =
      if (dfs.length == 1) dfs.head
      else balancedUnion(dfs.grouped(2).map {
        case Seq(a, b) => a.unionByName(b)
        case Seq(a) => a
      }.toSeq)
    val chunkRowsDf = balancedUnion(selected.map { pid =>
      val live = spark.read.schema(leafSchema)
        .parquet(s"${chunksPath(outDir)}/part_id=$pid")
      // an upsert's delta chunks join the SAME single-task branch as the
      // partition's stored chunks (a separate branch would emit the same
      // part's chunks from two tasks and collide on chunk ids)
      val withDelta = deltaDir
        .map(d => new org.apache.hadoop.fs.Path(d, s"part_id=$pid"))
        .filter(fs.exists)
        .map(p => live.unionByName(spark.read.schema(leafSchema).parquet(p.toString)))
        .getOrElse(live)
      withDelta.withColumn("part_id", lit(pid)).coalesce(1)
    })

    val bias = cfg.bwtBias
    val forceReencode = reencode
    // ship the url set as an explicit torrent broadcast, not a closure
    // capture: a delete-batch-sized set (<= MaxDeleteUrls = 100k urls)
    // closure-captured here inflates the TASK BINARY to tens of MB, which
    // the scheduler re-broadcasts on every stage (re)submission and warns
    // about; a broadcast variable ships once per executor and is reused
    val bcDrop = spark.sparkContext.broadcast(dropUrls)
    val hasDrop = dropUrls.nonEmpty // driver-side fact, avoids .value.isEmpty per chunk
    val pre = chunkRowsDf.as[EncodedChunk].mapPartitions { it =>
      it.flatMap { c =>
        val rows = compactPreRows(c, bias, forceReencode)
        // delta chunks carry the REPLACEMENT rows of the very urls being
        // dropped from the stored generation — never filter those
        if (!hasDrop || c.chunk_id >= UpsertDeltaChunkBase) rows
        else rows.filterNot(r => bcDrop.value.contains(new String(r._1, UTF_8)))
      }
    }
    pre.toDF()
      // narrow: no exchange, spillable. BinaryType sorts in unsigned byte
      // order = the UTF8String order the old String column sorted in
      .sortWithinPartitions($"_6", $"_1")
      .as[(Array[Byte], Long, Array[Byte], Array[Byte], Array[Byte], Int)]
      .mapPartitions(it => encodePreEncodedSorted(it, cfg.chunkRows, _ => (), bias))
  }

  /** Per-partition (part_id, n_chunks, n_rows) from the chunks table's
    * metadata columns (column-pruned scan, no payload IO; one small tuple
    * per live partition) — the ONE aggregation behind both
    * [[fragmentedPartIds]] and [[describe]], so the health probe and the
    * compaction selector cannot diverge.
    */
  private def partChunkStats(
      spark: SparkSession, outDir: String): Array[(Int, Long, Long)] = {
    import spark.implicits._
    spark.read.parquet(chunksPath(outDir))
      .groupBy($"part_id")
      .agg(count(lit(1)).as("n_chunks"), sum($"n_rows").as("n_rows"))
      .as[(Int, Long, Long)].collect()
  }

  /** True iff a partition's chunk count exceeds its ideal layout by more
    * than `slackChunks` — shared by selector and health probe.
    */
  private def isFragmented(
      nChunks: Long, nRows: Long, chunkRows: Int, slackChunks: Int): Boolean =
    nChunks > math.ceil(nRows / chunkRows.toDouble) + slackChunks

  /** Partitions fragmented enough to pay for compaction: more committed
    * chunks than `ceil(rows / chunkRows) + slackChunks`, from a
    * metadata-only (nested-pruned) scan of the chunks table — the
    * Iceberg-`rewrite_data_files`-style selection that lets routine
    * maintenance rewrite only what appends actually fragmented instead of
    * hand-picked partitions or the whole table.
    */
  def fragmentedPartIds(
      spark: SparkSession,
      outDir: String,
      cfg: EncodeConfig = EncodeConfig(),
      slackChunks: Int = 2
  ): Seq[Int] = {
    // a half-swapped table would silently mis-count (a mid-swap partition's
    // rows are missing entirely) — same fail-fast contract as the readers
    requireNoPendingSwap(spark, outDir)
    if (!hasCommittedChunks(spark, outDir)) return Seq.empty
    val chunkRows =
      readMeta(spark, outDir).map(_.chunkRows).getOrElse(cfg.chunkRows)
    partChunkStats(spark, outDir)
      .filter { case (_, c, r) => isFragmented(c, r, chunkRows, slackChunks) }
      .map(_._1).toSeq.sorted
  }

  /** One-row health snapshot of the encoded table at `outDir` — the ops
    * surface for a long-lived store (is a repair pending? is a writer in
    * flight? how fragmented did the append stream leave the layout?).
    * Unlike the readers, `describe` never fails on a pending swap — a
    * health probe must be usable exactly when the table is sick — so when
    * `pending_swap` is true the chunk-derived counts reflect the
    * half-swapped layout mid-repair, not the final state. Reads only the
    * `part_id`/`n_rows` metadata columns of the chunks table (column-
    * pruned scan, no payload IO) and collects one small tuple per live
    * partition — O(partitions), same bound as [[fragmentedPartIds]].
    */
  def describe(
      spark: SparkSession,
      outDir: String,
      cfg: EncodeConfig = EncodeConfig(),
      slackChunks: Int = 2): Dataset[TableHealth] = {
    import spark.implicits._
    val fs = chunksFs(spark, outDir)
    val pending = fs.exists(swapMarkerPath(outDir))
    val lease = fs.exists(writerLockPath(outDir))
    val meta = readMeta(spark, outDir)
    val (rows, chunks, partsLive, fragged) =
      if (!hasCommittedChunks(spark, outDir)) (0L, 0L, 0, 0)
      else {
        // same chunkRows fallback chain and fragmentation predicate as
        // fragmentedPartIds — a meta-less table or a non-default slack
        // must read identically from the probe and the selector
        val chunkRows = meta.map(_.chunkRows).getOrElse(cfg.chunkRows)
        val per = partChunkStats(spark, outDir)
        (per.map(_._3).sum, per.map(_._2).sum, per.length,
          per.count { case (_, c, r) => isFragmented(c, r, chunkRows, slackChunks) })
      }
    spark.createDataset(Seq(TableHealth(
      rows, chunks, partsLive,
      meta.map(_.numPartitions).getOrElse(0), meta.map(_.saltFactor).getOrElse(0),
      meta.map(_.chunkRows).getOrElse(0), fragged, pending, lease)))
  }

  /** Roll forward a compaction swap that crashed after its `_SWAP` marker
    * was written (the marker proves the staging dir is complete): finish
    * the remaining renames, recompute the affected lineage rows, drop the
    * staging dir. Pre-marker staging leftovers are NOT touched here — the
    * live table is still canonical and [[compact]] discards them on its
    * next run. Returns true when a pending swap was completed. Called
    * automatically by every write entry point ([[run]]/[[append]]/
    * [[compact]]); readers instead fail fast via [[requireNoPendingSwap]].
    */
  def completePendingCompactSwap(spark: SparkSession, outDir: String): Boolean = {
    val fs = chunksFs(spark, outDir)
    if (!fs.exists(swapMarkerPath(outDir))) return false
    withWriterLock(spark, outDir) { completePendingCompactSwapLocked(spark, fs, outDir) }
  }

  private def completePendingCompactSwapLocked(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      outDir: String
  ): Boolean = {
    if (!fs.exists(swapMarkerPath(outDir))) return false
    val markerLen = fs.getFileStatus(swapMarkerPath(outDir)).getLen.toInt
    val bytes = new Array[Byte](markerLen)
    val in = fs.open(swapMarkerPath(outDir))
    try in.readFully(0, bytes) finally in.close()
    val content = new String(bytes, UTF_8)
    // a marker without the `;` terminator sentinel was never committed by
    // [[writeSwapMarker]]'s rename (truncated/corrupt/legacy file): the
    // live table is still canonical, so discard it with the staging dir
    // instead of misparsing it into a bogus roll-forward
    if (!content.endsWith(";")) {
      fs.delete(new org.apache.hadoop.fs.Path(compactTmpPath(outDir)), true)
      return false
    }
    // marker entries: "<pid>" = swap staged dir in; "<pid>:drop" = the
    // partition's rewrite produced no rows (delete emptied it) — remove it
    val actions = content.stripSuffix(";").split(",").filter(_.nonEmpty).toSeq.map { e =>
      if (e.endsWith(":drop")) (e.stripSuffix(":drop").toInt, true)
      else (e.toInt, false)
    }
    finishSwap(spark, outDir, actions)
    true
  }

  /** Readers call this before scanning the chunks table: a pending `_SWAP`
    * marker means partition directories may be mid-swap (momentarily
    * missing), so a read could silently drop rows. Repair by re-running
    * [[compact]] or [[completePendingCompactSwap]] (write entry points do
    * this automatically).
    */
  def requireNoPendingSwap(spark: SparkSession, outDir: String): Unit = {
    val fs = chunksFs(spark, outDir)
    require(!fs.exists(swapMarkerPath(outDir)),
      s"encoded table at $outDir has an interrupted compaction swap pending; " +
        "run EncodeJob.completePendingCompactSwap (or any write) to repair before reading")
  }

  /** Swap staged partition dirs into the live table (or remove partitions
    * a delete emptied), recompute + replace the affected lineage rows, and
    * remove the staging dir — the shared tail of [[compact]]/[[delete]]
    * and [[completePendingCompactSwap]]. Idempotent: a part already
    * swapped (its staged dir gone) or already dropped is skipped, and
    * lineage is recomputed from the live chunks table rather than carried
    * through the crash.
    *
    * Reader-outage window: readers fail fast while the `_SWAP` marker
    * exists, so the marker should live exactly as long as a read could be
    * WRONG. For a drop-free swap (compaction/upsert — every partition's
    * rows survive, only their chunk layout changes) the table is fully
    * consistent the moment the O(parts) renames finish, so the marker is
    * cleared RIGHT THEN — before the lineage recompute (a full Spark
    * aggregation), which would otherwise hard-error every concurrent
    * reader of a live streaming table on each healthy in-stream compaction
    * cycle. The cost is a narrow crash window in which live chunks are new
    * but lineage metrics are stale (data correct; metrics self-heal on the
    * next compact of those parts). A swap WITH drops (delete) keeps the
    * marker through the lineage replace: the zero-row tombstones it writes
    * are load-bearing for resume safety, so "repair me first" must hold
    * until they are durable.
    */
  private def finishSwap(
      spark: SparkSession,
      outDir: String,
      actions: Seq[(Int, Boolean)] // (part_id, dropPartition)
  ): Seq[LineageRecord] = {
    val fs = chunksFs(spark, outDir)
    actions.foreach { case (pid, drop) =>
      val staged = new org.apache.hadoop.fs.Path(compactTmpPath(outDir), s"part_id=$pid")
      val live = new org.apache.hadoop.fs.Path(chunksPath(outDir), s"part_id=$pid")
      if (drop) {
        if (fs.exists(staged)) fs.delete(staged, true)
        if (fs.exists(live)) fs.delete(live, true)
      } else if (fs.exists(staged)) {
        if (fs.exists(live)) fs.delete(live, true)
        require(fs.rename(staged, live), s"failed to swap in compacted $live")
      }
    }
    if (actions.forall(!_._2) && fs.exists(swapMarkerPath(outDir)))
      fs.delete(swapMarkerPath(outDir), false)
    val parts = actions.map(_._1)
    val live = lineageFromChunks(spark, outDir, parts)
    // a dropped (fully-deleted) partition keeps a zero-row "done" lineage
    // TOMBSTONE: donePartIds still lists it, so a later resume-style run()
    // with the original input does NOT re-encode the partition and
    // resurrect taken-down urls — deletion durability must not depend on
    // whether a url shared its partition with surviving rows. Tombstones
    // are strict: only removing the table directory starts a new corpus
    // (new data still lands via append's wiped-table path).
    val havePids = live.map(_.part_id).toSet
    val tombstones = actions.collect { case (pid, true) if !havePids.contains(pid) =>
      LineageRecord(pid, 0L, 0L, 0L, 0L, "", 0L, "done")
    }
    val records = live ++ tombstones
    replaceLineageRows(spark, outDir, parts.toSet, records)
    // staging dir goes last (for a swap with drops this also removes the
    // marker, which until here kept the table in "repair me first" state;
    // a drop-free swap already cleared it right after the renames)
    fs.delete(new org.apache.hadoop.fs.Path(compactTmpPath(outDir)), true)
    records
  }

  /** Recompute the lineage rows of `parts` from the live chunks table's
    * metadata columns alone (nested-pruned scan: codec/bytes/hash leaves,
    * never a payload). Field-for-field the same aggregation the encode
    * kernels stream out, so a recomputed row is indistinguishable from an
    * original one.
    */
  private def lineageFromChunks(
      spark: SparkSession,
      outDir: String,
      parts: Seq[Int]
  ): Seq[LineageRecord] = {
    import spark.implicits._
    // a delete can have emptied EVERY partition: scanning a data-file-less
    // chunks dir would throw (schema inference) with the _SWAP marker
    // still pending — i.e. a permanently wedged table
    if (!hasCommittedChunks(spark, outDir)) return Seq.empty
    val cols = Seq("url", "warc_ts", "html", "text", "lang")
    // ONE aggregation job: the five per-column codec strings travel as an
    // array column and are merged by collect_set-of-arrays (flattened
    // driver-side) — a separate exploded pass would scan the metadata twice
    val sums = spark.read.parquet(chunksPath(outDir))
      .filter($"part_id".isin(parts: _*))
      .select(
        $"part_id", $"n_rows",
        cols.map(c => col(s"$c.bytes_in")).reduce(_ + _).as("bin"),
        cols.map(c => col(s"$c.bytes_out")).reduce(_ + _).as("bout"),
        cols.map(c => col(s"$c.payload_hash")).reduce(_.bitwiseXOR(_)).as("h"),
        array(cols.map(c => concat(lit(s"$c="), col(s"$c.codec"))): _*).as("cs"))
      .groupBy($"part_id")
      .agg(sum($"n_rows").as("n_rows"), count(lit(1)).as("n_chunks"),
        sum($"bin").as("bin"), sum($"bout").as("bout"),
        expr("bit_xor(h)").as("h"),
        collect_set($"cs").as("css"))
      .as[(Int, Long, Long, Long, Long, Long, Seq[Seq[String]])].collect()
    sums.map { case (pid, nRows, nChunks, bin, bout, h, css) =>
      LineageRecord(pid, nRows, nChunks, bin, bout,
        css.flatten.distinct.sorted.mkString(","), h, "done")
    }.toSeq.sortBy(_.part_id)
  }

  /** REPLACE `parts`' lineage rows (append would double the metrics);
    * other partitions' rows are carried over untouched. Write-then-swap so
    * a crash never leaves the lineage table empty: if a previous swap
    * crashed between the delete and the rename, the intact `_swap_tmp` IS
    * the newest complete table — roll it forward before reading, or the
    * kept rows of every non-compacted partition would be lost for good.
    */
  private def replaceLineageRows(
      spark: SparkSession,
      outDir: String,
      parts: Set[Int],
      records: Seq[LineageRecord]
  ): Unit = {
    import spark.implicits._
    val lp = new org.apache.hadoop.fs.Path(lineagePath(outDir))
    val tmpPath = lineagePath(outDir) + "_swap_tmp"
    val tp = new org.apache.hadoop.fs.Path(tmpPath)
    val lfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!lfs.exists(lp) && hasCommittedFileUnder(spark, tmpPath)) {
      require(lfs.rename(tp, lp), s"failed to roll forward lineage swap at $tmpPath")
    }
    val kept =
      if (!lfs.exists(lp)) Seq.empty
      else spark.read.parquet(lineagePath(outDir)).as[LineageRecord]
        .collect().toSeq.filterNot(r => parts.contains(r.part_id))
    // fold superseded per-append rows while the table is being rewritten
    // anyway: append (batch and per-micro-batch streaming) APPENDS one row
    // per touched part per batch, so after thousands of micro-batches the
    // `_lineage` reads in donePartIds/append scan an ever-growing table —
    // folding here keeps it O(partitions) across any stream length (the
    // in-stream compaction hook reaches this pass every
    // `compactEveryBatches` batches). Sums/xor/codec-union are exactly the
    // aggregation lineageFromChunks computes, so a folded row is
    // indistinguishable from a recomputed one; a zero-row drop tombstone
    // folds harmlessly (0-row contribution) and keeps its part "done".
    val folded = kept.groupBy(_.part_id).map { case (pid, rs) =>
      if (rs.sizeIs == 1) rs.head
      else LineageRecord(pid,
        rs.map(_.n_rows).sum, rs.map(_.n_chunks).sum,
        rs.map(_.bytes_in).sum, rs.map(_.bytes_out).sum,
        rs.flatMap(_.codecs.split(',')).filter(_.nonEmpty)
          .distinct.sorted.mkString(","),
        rs.map(_.payload_hash).foldLeft(0L)(_ ^ _),
        if (rs.forall(_.status == "done")) "done" else rs.last.status)
    }.toSeq.sortBy(_.part_id)
    val newLineage = folded ++ records
    if (newLineage.nonEmpty) {
      if (lfs.exists(tp)) lfs.delete(tp, true)
      spark.createDataset(newLineage).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmpPath)
      lfs.delete(lp, true)
      lfs.rename(tp, lp)
    } else if (lfs.exists(lp)) {
      // a delete emptied every partition: stale rows must not survive
      lfs.delete(lp, true)
    }
  }

  /** One chunk row -> its per-page pre-encoded tuples (the exact input the
    * streaming kernel consumes). text/html bodies are reused as stored
    * ([[ColumnCodec.extractBwtBodies]] + the O(1)-ish
    * [[graft.codec.Pipelines.rawLenOf]] header recovery) unless the stored
    * codec is not per-value (chunk-level Dict/Rle/Fsst/Raw from a
    * `mapSidePreEncode = false` table) or `reencode` forces the full
    * decode + per-value re-encode.
    */
  private def compactPreRows(
      c: EncodedChunk,
      bias: Double,
      reencode: Boolean
  ): Iterator[(Array[Byte], Long, Array[Byte], Array[Byte], Array[Byte], Int)] = {
    val urls = ColumnCodec.decodeBinary(c.url.payload)
    val tss = ColumnCodec.decodeLong(c.warc_ts.payload)
    val langs = ColumnCodec.decodeBinaryNullable(c.lang.payload)
    def preCol(cc: ColChunk): Array[Array[Byte]] = {
      if (!reencode) ColumnCodec.extractBwtBodies(cc.payload) match {
        case Some(bodies) =>
          return bodies.map { b =>
            if (b == null) null
            else {
              val buf = new graft.codec.Bytes.Buf(b.length + 5)
              buf.writeVarLong(graft.codec.Pipelines.rawLenOf(b))
              buf.writeBytes(b)
              buf.toArray
            }
          }
        case None => ()
      }
      ColumnCodec.decodeBinaryNullable(cc.payload).map(v => preEncodeValue(v, bias))
    }
    val htmlPre = preCol(c.html)
    val textPre = preCol(c.text)
    // stored bytes/micros feed the kernel directly — the former
    // String/Timestamp round-trip existed only to match the old row shape
    urls.indices.iterator.map { i =>
      (urls(i), tss(i), htmlPre(i), textPre(i), langs(i), c.part_id)
    }
  }

  /** Plan-dump seam: the encode dataflow as a DataFrame (no lineage side
    * effects, nothing written) — lets tools dump the encode plan that
    * [[run]] executes without running a write.
    */
  private[graft] def encodeChunkStreamForPlan(pages: DataFrame, cfg: EncodeConfig): DataFrame =
    encodeChunkStream(pages.withColumn("part_id", partIdCol(cfg)), cfg, _ => ()).toDF()

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
      // each value becomes varint(rawLen) ++ textEncode(bytes). The scan
      // hands the kernel RAW UTF-8 bytes and epoch-micros (cast/
      // unix_micros are codegen'd): the former String/Timestamp row shape
      // paid a UTF-16 decode + re-encode per text/url/lang value and a
      // Timestamp object per row, all garbage by the next operator —
      // cast("binary") of a parquet string column is exactly its UTF-8
      // bytes, so the kernel input (and every payload byte) is unchanged.
      val bias = cfg.bwtBias
      val pre = todo
        .select(col("url").cast("binary"), unix_micros(col("warc_ts")),
          col("html"), col("text").cast("binary"), col("lang").cast("binary"),
          col("part_id"))
        .as[(Array[Byte], Long, Array[Byte], Array[Byte], Array[Byte], Int)]
        .mapPartitions { it =>
          it.map { case (url, ts, html, text, lang, pid) =>
            (url, ts, preEncodeValue(html, bias), preEncodeValue(text, bias),
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
    * INSERT-ONLY semantics across batches: within one delta the newest
    * `warc_ts` row wins, but a url already present in the STORED table
    * always wins over any later delta row — a re-crawl of a stored url is
    * dropped, not updated (updating means rewriting the covering chunk
    * files; [[upsert]] does exactly that for deliberate refreshes). The
    * streaming surface
    * ([[graft.streaming.StreamingEncodeJob.startAppending]]) inherits
    * exactly this: first successfully-stored version of a url is final.
    *
    * Returns this append's lineage records (empty if the delta was fully
    * deduplicated).
    */
  def append(
      spark: SparkSession,
      delta: Dataset[Page],
      outDir: String,
      cfg: EncodeConfig = EncodeConfig()
  ): Dataset[LineageRecord] = withWriterLock(spark, outDir) {
    import spark.implicits._

    requireLayoutMatch(spark, outDir, cfg)
    completePendingCompactSwap(spark, outDir)

    // intra-delta dedupe FIRST (it applies to the bootstrap path too): a
    // crawler re-delivering the same url WITHIN one batch is as normal as
    // across batches
    val deduped = dedupeDelta(delta)
    val withPart = deduped.withColumn("part_id", partIdCol(cfg))

    // Bootstrap vs wiped-table routing. A dir with no committed chunks is
    // either a NEW table (the initial encode — the natural way to start an
    // incrementally-built table) or a WIPED one (every partition deleted).
    // The distinction matters because run()'s resume skip would let a
    // wipe's zero-row lineage tombstones silently drop the delta, while
    // clearing the tombstones instead would let a resume-style run()
    // resurrect taken-down urls — so a wiped table takes the normal
    // incremental path below with the stored-url scan and offsets skipped.
    // "New" means: no committed data file (staging junk from a crashed
    // bootstrap attempt does not count, and run()'s Overwrite clears it;
    // no _SUCCESS check — dynamic-partition-overwrite commits write none),
    // AND no meta, AND no lineage rows — meta alone would misclassify a
    // pre-meta legacy table (or one whose _meta died in writeMeta's
    // delete-then-rewrite window) whose tombstones would then swallow the
    // delta inside run().
    val hasChunks = hasCommittedChunks(spark, outDir)
    if (!hasChunks && readMeta(spark, outDir).isEmpty &&
        donePartIds(spark, outDir).isEmpty)
      return run(spark, deduped, outDir, cfg)

    // --- dedupe against the stored table via per-chunk url ranges (nested
    // pruning: only the url payload leaf is read, never html/text)
    val newRows = if (!hasChunks) withPart.toDF()
      .select("url", "warc_ts", "html", "text", "lang", "part_id")
    else {
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
      withPart.join(existingUrls, Seq("url"), "left_anti")
        // join reorders columns (join key first); restore kernel column order
        .select("url", "warc_ts", "html", "text", "lang", "part_id")
    }

    // --- chunk-id offsets: max existing chunk_id + 1 per part, from the
    // CHUNKS table (metadata-only, column-pruned scan) rather than the
    // lineage table: chunk files commit before lineage rows, so after a
    // crash in that window the lineage undercounts and a lineage-derived
    // offset would reuse an orphaned chunk's (part_id, chunk_id) key
    val offsets: Map[Int, Int] =
      if (!hasChunks) Map.empty
      else spark.read.parquet(chunksPath(outDir))
        .groupBy($"part_id").agg(max($"chunk_id").as("m"))
        .as[(Int, Int)].collect().map { case (pid, m) => pid -> (m + 1) }.toMap
    val bcOff = spark.sparkContext.broadcast(offsets)

    val acc = new org.apache.spark.util.CollectionAccumulator[LineageRecord]
    spark.sparkContext.register(acc, "graft_lineage_append")

    writeChunks(
      encodeChunkStream(newRows, cfg, r => acc.add(r))
        .map(c => c.copy(chunk_id = c.chunk_id + bcOff.value.getOrElse(c.part_id, 0)))
        .toDF(),
      chunksPath(outDir), SaveMode.Append)

    import scala.jdk.CollectionConverters._
    val records = acc.value.asScala.toSeq.distinct
    if (records.nonEmpty) {
      spark.createDataset(records).coalesce(1)
        .write.mode(SaveMode.Append).parquet(lineagePath(outDir))
    }
    spark.createDataset(records)
  }

  /** Intra-delta url dedupe with a DETERMINISTIC winner (newest `warc_ts`,
    * content hash as tie-break) — dropDuplicates would pick a
    * partitioning-dependent row and break re-append/re-upsert idempotence.
    * Shared by [[append]] and [[upsert]] so the two verbs cannot disagree
    * on which delta row a url resolves to.
    */
  private def dedupeDelta(delta: Dataset[Page]): Dataset[Page] = {
    val spark = delta.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, xxhash64(col("text"), col("html"), col("lang")).desc)
    delta.toDF()
      .withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1)
      .select("url", "warc_ts", "html", "text", "lang").as[Page]
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

  // (url utf-8 bytes, warc_ts epoch micros, html pre-encoded, text
  // pre-encoded, lang utf-8 bytes) — raw bytes end to end; Strings exist
  // only in the per-chunk url_min/url_max metadata
  private type PreRow = (Array[Byte], Long, Array[Byte], Array[Byte], Array[Byte])

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
      require(r._1 != null, "null url/warc_ts")
      r._1
    }.toArray
    val tss = chunk.map(_._2).toArray
    val langs = chunk.map(_._5).toArray
    def bin(values: Array[Array[Byte]]): ColChunk = {
      val payload = ColumnCodec.encodeBinaryNullable(values, bwtBias)
      ColChunk(ColumnCodec.codecName(payload),
        values.map(v => if (v == null) 0L else v.length.toLong).sum,
        payload.length.toLong, fnv1a(payload), payload)
    }
    val tsPayload = ColumnCodec.encodeLong(tss)
    // chunk is a url-sorted slice, so its url range is (first, last)
    EncodedChunk(pid, cid, chunk.length,
      new String(chunk.head._1, UTF_8), new String(chunk.last._1, UTF_8),
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
      it: Iterator[(Array[Byte], Long, Array[Byte], Array[Byte], Array[Byte], Int)],
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
      // urls are already UTF-8 bytes: unsigned byte order directly (the
      // same order Catalyst's BinaryType sort gives the streaming kernel)
      val rows = rows0.sortInPlaceWith((x, y) =>
        java.util.Arrays.compareUnsigned(x._1, y._1) < 0)
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
      it: Iterator[(Array[Byte], Long, Array[Byte], Array[Byte], Array[Byte], Int)],
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
