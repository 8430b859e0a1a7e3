package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets.UTF_8

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Local-mode shared-JVM failure switch for the crash-resume test. */
object FailureInjection {
  @volatile var armed: Boolean = false
}

class SparkJobsSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  /** (part_id, chunk_id) -> the five per-column payload hashes. */
  private def chunkHashMap(out: String): Map[(Int, Int), Seq[Long]] =
    spark.read.parquet(EncodeJob.chunksPath(out))
      .select("part_id", "chunk_id", "url.payload_hash", "warc_ts.payload_hash",
        "html.payload_hash", "text.payload_hash", "lang.payload_hash")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("pages generator is deterministic and schema-exact") {
    val p1 = PagesGen.page(42L, 7L, 100, hostSkew = false)
    val p2 = PagesGen.page(42L, 7L, 100, hostSkew = false)
    assert(p1.url == p2.url && p1.text == p2.text && p1.lang == p2.lang)
    assert(java.util.Arrays.equals(p1.html, p2.html))
    assert(p1.warc_ts == p2.warc_ts)
    val df = PagesGen.generate(spark, 50, partitions = 4).toDF()
    assert(df.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    assert(df.count() == 50)
  }

  test("encode -> decode -> verify: bit-identical and size gate") {
    val out = tmpDir("roundtrip")
    val pages = PagesGen.generate(spark, 200, partitions = 4)
    EncodeJob.run(spark, pages, out, EncodeConfig(numPartitions = 4, chunkRows = 64))
    val report = VerifyJob.run(spark, pages, out)
    assert(report.rows_source == 200)
    assert(report.rows_decoded == 200)
    assert(report.mismatched_rows == 0, report)
    assert(report.except_violations == 0, report)
    assert(report.size_gate_ok, report)
  }

  test("resume: completed partitions are skipped; missing ones re-encoded idempotently") {
    import spark.implicits._
    val out = tmpDir("resume")
    val pages = PagesGen.generate(spark, 150, partitions = 4)
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 64)

    EncodeJob.run(spark, pages, out, cfg)
    val lineage1 = spark.read.parquet(EncodeJob.lineagePath(out))
      .as[LineageRecord].collect().sortBy(_.part_id)

    // a second run with everything done must be a no-op
    EncodeJob.run(spark, pages, out, cfg)
    val lineage2 = spark.read.parquet(EncodeJob.lineagePath(out))
      .as[LineageRecord].collect().sortBy(_.part_id)
    assert(lineage2.length == lineage1.length, "no-op rerun must not add lineage")

    // simulate a lost partition: drop one part's lineage (as if its attempt
    // died before checkpointing) — rerun must re-encode exactly that part
    val victim = lineage1.head.part_id
    val kept = lineage1.filterNot(_.part_id == victim)
    val lineageDir = new java.io.File(EncodeJob.lineagePath(out))
    lineageDir.listFiles().foreach(_.delete())
    spark.createDataset(kept.toIndexedSeq).write.mode("overwrite")
      .parquet(EncodeJob.lineagePath(out))

    EncodeJob.run(spark, pages, out, cfg)
    val lineage3 = spark.read.parquet(EncodeJob.lineagePath(out))
      .as[LineageRecord].collect().sortBy(_.part_id)
    assert(lineage3.map(_.part_id).toSeq == lineage1.map(_.part_id).toSeq)
    // re-encoded partition is byte-identical to the original attempt
    val h1 = lineage1.find(_.part_id == victim).get.payload_hash
    val h3 = lineage3.find(_.part_id == victim).get.payload_hash
    assert(h1 == h3, "re-encode must be deterministic/idempotent")
    // untouched partitions keep their hashes too
    kept.foreach { r =>
      assert(lineage3.find(_.part_id == r.part_id).get.payload_hash == r.payload_hash)
    }
    // and the data is still fully decodable + identical
    val report = VerifyJob.run(spark, pages, out)
    assert(report.mismatched_rows == 0 && report.except_violations == 0)
  }

  test("crashed run leaves no committed state; clean rerun completes and verifies") {
    import spark.implicits._
    val out = tmpDir("crash")
    val pages = PagesGen.generate(spark, 120, partitions = 4)
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 64)

    // inject a mid-job failure: one poisoned document makes its encode
    // task (and so the whole write job) fail before commit
    val poisoned = pages.map { p =>
      if (FailureInjection.armed && p.url.hashCode % 7 == 0)
        throw new RuntimeException("injected task failure")
      p
    }
    FailureInjection.armed = true
    val failed =
      try { EncodeJob.run(spark, poisoned, out, cfg); false }
      catch { case _: Throwable => true }
    FailureInjection.armed = false
    assert(failed, "injected failure must fail the job")
    // no lineage checkpoint may exist for the aborted attempt
    assert(EncodeJob.donePartIds(spark, out).isEmpty, "aborted job must not checkpoint lineage")

    // rerun (resume from nothing) completes and passes the gates
    EncodeJob.run(spark, poisoned, out, cfg) // armed=false: same dataset, no poison
    val report = VerifyJob.run(spark, pages, out)
    assert(report.mismatched_rows == 0 && report.except_violations == 0, report)
  }

  test("null text/html/lang survive the encode/decode roundtrip (real crawl data has them)") {
    import spark.implicits._
    val out = tmpDir("nulls")
    val base = PagesGen.generate(spark, 60, partitions = 2).collect()
    val withNulls = base.zipWithIndex.map { case (p, i) =>
      i % 5 match {
        case 0 => p.copy(text = null)
        case 1 => p.copy(html = null)
        case 2 => p.copy(lang = null)
        case 3 => p.copy(text = null, html = null, lang = null)
        case _ => p
      }
    }
    val ds = spark.createDataset(withNulls.toIndexedSeq)
    EncodeJob.run(spark, ds, out, EncodeConfig(numPartitions = 2, chunkRows = 16))
    val report = VerifyJob.run(spark, ds, out)
    assert(report.rows_decoded == 60)
    assert(report.mismatched_rows == 0, report)
    assert(report.except_violations == 0, report)
    // decoded nulls really are nulls, not empty strings
    val decoded = DecodeJob.run(spark, out).collect().map(p => p.url -> p).toMap
    withNulls.foreach { p =>
      val d = decoded(p.url)
      assert((d.text == null) == (p.text == null), s"text nullness ${p.url}")
      assert((d.html == null) == (p.html == null), s"html nullness ${p.url}")
      assert((d.lang == null) == (p.lang == null), s"lang nullness ${p.url}")
    }
  }

  test("map-side pre-encode: same bit-identical result, compressed shuffle") {
    import spark.implicits._
    val out = tmpDir("preenc")
    val base = PagesGen.generate(spark, 80, partitions = 2).collect()
    val withNulls = base.zipWithIndex.map { case (p, i) =>
      if (i % 7 == 0) p.copy(text = null) else if (i % 11 == 0) p.copy(html = null) else p
    }
    val ds = spark.createDataset(withNulls.toIndexedSeq)
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 32, mapSidePreEncode = true)
    EncodeJob.run(spark, ds, out, cfg)
    val report = VerifyJob.run(spark, ds, out)
    assert(report.rows_decoded == 80)
    assert(report.mismatched_rows == 0, report)
    assert(report.except_violations == 0, report)
    // lineage raw byte accounting survives pre-encoding
    val lin = spark.read.parquet(EncodeJob.lineagePath(out))
    val bytesIn = lin.agg(org.apache.spark.sql.functions.sum("bytes_in")).first().getLong(0)
    val expected = withNulls.map { p =>
      p.url.getBytes("UTF-8").length.toLong + 8L +
        (if (p.html == null) 0L else p.html.length.toLong) +
        (if (p.text == null) 0L else p.text.getBytes("UTF-8").length.toLong) +
        (if (p.lang == null) 0L else p.lang.getBytes("UTF-8").length.toLong)
    }.sum
    assert(bytesIn == expected, s"bytes_in $bytesIn vs $expected")
  }

  test("streaming (spill-safe) kernel emits identical chunks + lineage to the buffering kernel") {
    // exercise chunk boundaries: 96 rows / 32-row chunks = exact multiple,
    // a ragged tail, and chunkRows=1 (part-change append lands in an
    // already-full buffer — regression for the >=-vs-== flush condition)
    Seq(96 -> 32, 100 -> 32, 17 -> 1).foreach { case (nRows, chunkRows) =>
      val pages = PagesGen.generate(spark, nRows, partitions = 3)
      def runWith(spill: Boolean): (Map[(Int, Int), Seq[Long]], Map[Int, (Long, Long, Long)]) = {
        val out = tmpDir(s"spill_$spill${nRows}")
        val rep = EncodeJob.run(spark, pages, out,
          EncodeConfig(numPartitions = 3, chunkRows = chunkRows, spillSafeSort = spill))
        val lineage = rep.collect().map(l => l.part_id -> ((l.n_rows, l.bytes_out, l.payload_hash))).toMap
        (chunkHashMap(out), lineage)
      }
      val (cs, ls) = runWith(true)
      val (cb, lb) = runWith(false)
      assert(cs == cb, s"chunk payloads differ (nRows=$nRows)")
      assert(ls == lb, s"lineage differs (nRows=$nRows)")
    }
  }

  test("kernels agree on supplementary-character urls (UTF-8 vs UTF-16 order)") {
    // U+FFF0 sorts AFTER U+1F600 in UTF-16 code units (surrogate 0xD83D <
    // 0xFFF0) but BEFORE it in UTF-8 bytes (EF BF B0 < F0 9F 98 80). The
    // buffering kernel must slice chunks in the same (UTF-8) order Catalyst's
    // spill-safe sort uses, or payload hashes diverge.
    import spark.implicits._
    val base = PagesGen.generate(spark, 12, partitions = 1).collect()
    val pages = base.zipWithIndex.map { case (p, i) =>
      val marker = if (i % 2 == 0) "￰" else "😀" // U+FFF0 vs U+1F600
      p.copy(url = s"https://x.test/$marker/${i / 2}")
    }
    val ds = spark.createDataset(pages.toIndexedSeq)
    def hashes(spill: Boolean): Map[(Int, Int), Seq[Long]] = {
      val out = tmpDir(s"nonbmp_$spill")
      EncodeJob.run(spark, ds, out,
        EncodeConfig(numPartitions = 2, chunkRows = 4, spillSafeSort = spill))
      chunkHashMap(out)
    }
    assert(hashes(true) == hashes(false), "non-BMP urls sliced differently by the two kernels")
  }

  test("speed-biased encode (bwtBias=0, no BWT) is still bit-identical") {
    val out = tmpDir("speedbias")
    val pages = PagesGen.generate(spark, 150, partitions = 4)
    EncodeJob.run(spark, pages, out,
      EncodeConfig(numPartitions = 4, chunkRows = 64, bwtBias = 0.0))
    val report = VerifyJob.run(spark, pages, out)
    assert(report.mismatched_rows == 0 && report.except_violations == 0)
  }

  test("SearchJob.runWithIndex: second invocation never touches docs (no SA-IS)") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(("a", "abracadabra"), ("b", "banana band stand")))
    val dir = tmpDir("searchidx")
    val viaIndex = SearchJob.runWithIndex(spark, docs, Seq("ab", "an"), dir)
      .collect().map(h => (h.doc_key, h.pattern, h.cnt, h.first_pos)).toSet
    val oneShot = SearchJob.run(spark, docs, Seq("ab", "an"))
      .collect().map(h => (h.doc_key, h.pattern, h.cnt, h.first_pos)).toSet
    assert(viaIndex == oneShot)
    // an index table now exists at dir: a poisoned docs dataset proves the
    // second invocation reads only the stored index
    val poisoned = docs.map { _ => sys.error("docs must not be evaluated"): (String, String) }
    val second = SearchJob.runWithIndex(spark, poisoned, Seq("ab", "an"), dir)
      .collect().map(h => (h.doc_key, h.pattern, h.cnt, h.first_pos)).toSet
    assert(second == oneShot)
  }

  test("salting spreads skewed url-hosts across partitions") {
    import org.apache.spark.sql.functions._
    val skewed = PagesGen.generate(spark, 2000, hostSkew = true, partitions = 4)
    def maxPartFraction(saltFactor: Int): Double = {
      val counts = skewed
        .withColumn("part_id", EncodeJob.partIdCol(EncodeConfig(numPartitions = 16, saltFactor = saltFactor)))
        .groupBy("part_id").count().collect().map(_.getLong(1))
      counts.max.toDouble / counts.sum
    }
    val unsalted = maxPartFraction(1)
    val salted = maxPartFraction(8)
    assert(salted < unsalted,
      s"salting should flatten the skew: salted=$salted unsalted=$unsalted")
    // uniform would be 1/16 ≈ 0.0625; unsalted skew puts ~80% of rows on
    // ≤5 of 16 partitions (max ≥ ~0.16 guaranteed, often ~0.3). Allow for
    // bucket-collision variance on the salted side.
    assert(salted <= 0.20, s"salted max partition fraction too high: $salted")
  }

  test("distributed FM search matches naive counting") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "abracadabra abracadabra"),
      ("d2", "the quick brown fox"),
      ("d3", "aaaaaa")
    ).toDS()
    val hits = SearchJob.run(spark, docs, Seq("abra", "a", "fox", "zz"))
      .collect().map(h => (h.doc_key, h.pattern) -> h).toMap
    assert(hits(("d1", "abra")).cnt == 4)
    assert(hits(("d1", "abra")).first_pos == Some(1L))
    assert(hits(("d2", "fox")).cnt == 1)
    assert(hits(("d2", "fox")).first_pos == Some(17L))
    assert(hits(("d3", "a")).cnt == 6)
    assert(hits(("d2", "zz")).cnt == 0)
    assert(hits(("d2", "zz")).first_pos == None)
  }

  test("lookupUrls / decodeUrlPrefix: point reads decode only range-covering chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = tmpDir("lookup")
    val pages = PagesGen.generate(spark, 300, partitions = 4)
    EncodeJob.run(spark, pages, out, EncodeConfig(numPartitions = 4, chunkRows = 8))
    val all = pages.collect()

    // point lookup: exact pages back, bit-identical
    val wanted = Seq(all(7), all(123), all(250))
    val got = DecodeJob.lookupUrls(spark, out, wanted.map(_.url)).collect()
      .map(p => p.url -> p).toMap
    assert(got.size == 3)
    wanted.foreach { p =>
      val d = got(p.url)
      assert(d.text == p.text && d.lang == p.lang && d.warc_ts == p.warc_ts)
      assert(java.util.Arrays.equals(d.html, p.html))
    }
    // absent url: no row, no error
    assert(DecodeJob.lookupUrls(spark, out, Seq("https://nope.example/x")).count() == 0)
    assert(DecodeJob.lookupUrls(spark, out, Seq.empty).count() == 0)

    // the chunk filter really prunes: chunk url ranges are disjoint within
    // a part, so a url's range test matches at most one chunk per part —
    // 3 urls x 4 parts bounds the match at 12 of the ~40 groups
    val chunks = spark.read.parquet(EncodeJob.chunksPath(out))
    val totalGroups = chunks.select("part_id", "chunk_id").distinct().count()
    val pred = wanted.map(p => col("url_min") <= p.url && col("url_max") >= p.url)
      .reduce(_ || _)
    val matchedGroups = chunks.filter(pred).select("part_id", "chunk_id").distinct().count()
    assert(totalGroups >= 35, s"want many chunks for a meaningful test, got $totalGroups")
    assert(matchedGroups <= 12, s"pruning failed: $matchedGroups of $totalGroups chunks matched")

    // prefix read: one host's slice, compared against the full decode
    val prefix = "https://host3."
    val viaPrefix = DecodeJob.decodeUrlPrefix(spark, out, prefix).collect().map(_.url).sorted
    val expected = all.filter(_.url.startsWith(prefix)).map(_.url).sorted
    assert(viaPrefix.toSeq == expected.toSeq && expected.nonEmpty)

    // range read: [lo, hi) in UTF-8 byte order
    val sortedUrls = all.map(_.url).sorted
    val (lo, hi) = (sortedUrls(50), sortedUrls(80))
    val viaRange = DecodeJob.decodeUrlRange(spark, out, lo, hi).collect().map(_.url).sorted
    assert(viaRange.toSeq == sortedUrls.slice(50, 80).toSeq)
  }

  test("append: delta becomes new chunks only; union decodes; re-append is a no-op") {
    import spark.implicits._
    val out = tmpDir("append")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 32)
    val base = PagesGen.generate(spark, 150, partitions = 4)
    EncodeJob.run(spark, base, out, cfg)

    def chunkHashes(): Map[(Int, Int), Seq[Long]] = chunkHashMap(out)
    val baseChunks = chunkHashes()

    // a disjoint delta (docIds 150..199 => urls disjoint from the base)
    val all200 = PagesGen.generate(spark, 200, partitions = 4).collect()
    val delta = spark.createDataset(all200.drop(150).toIndexedSeq)
    val rep1 = EncodeJob.append(spark, delta, out, cfg).collect()
    assert(rep1.nonEmpty && rep1.forall(_.status == "done"))

    val afterAppend = chunkHashes()
    // every original chunk file is untouched, byte-for-byte
    baseChunks.foreach { case (k, h) =>
      assert(afterAppend(k) == h, s"append modified existing chunk $k")
    }
    assert(afterAppend.size > baseChunks.size, "append must add new chunks")

    // the union decodes bit-identically
    val union = base.collect() ++ delta.collect()
    val report = VerifyJob.run(spark, spark.createDataset(union.toIndexedSeq), out)
    assert(report.rows_decoded == 200 && report.mismatched_rows == 0 &&
      report.except_violations == 0, report)

    // re-appending the same delta is a no-op: no rows survive dedup,
    // no chunks added, no lineage rows added
    val rep2 = EncodeJob.append(spark, delta, out, cfg).collect()
    assert(rep2.isEmpty, "identical re-append must encode nothing")
    assert(chunkHashes() == afterAppend, "re-append must not touch chunk files")

    // an overlapping delta (docIds 180..219: 20 already stored, 20 new)
    val all220 = PagesGen.generate(spark, 220, partitions = 4).collect()
    val overlap = spark.createDataset(all220.drop(180).toIndexedSeq)
    val rep3 = EncodeJob.append(spark, overlap, out, cfg).collect()
    assert(rep3.map(_.n_rows).sum == 20, s"only the 20 new urls may encode: ${rep3.toSeq}")
    val union2 = union ++ all220.drop(200)
    val report2 = VerifyJob.run(spark, spark.createDataset(union2.toIndexedSeq), out)
    assert(report2.rows_decoded == 220 && report2.mismatched_rows == 0 &&
      report2.except_violations == 0, report2)
  }

  test("append: poisoned bootstrap dir recovers; intra-delta duplicates pick the newest row") {
    import spark.implicits._
    val out = tmpDir("appedge")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 16)
    val all = PagesGen.generate(spark, 40, partitions = 2).collect()

    // simulate a crash during the bootstrap write: chunks dir exists with
    // staging junk but no _SUCCESS — the redelivered batch must bootstrap,
    // not die on an unreadable parquet path
    val junk = new java.io.File(EncodeJob.chunksPath(out) + "/_temporary")
    junk.mkdirs()
    java.nio.file.Files.writeString(junk.toPath.resolve("leftover"), "staging junk")

    // the delta carries the same url TWICE (older + newer warc_ts): the
    // newer row must win deterministically
    val dup = all(7).copy(
      warc_ts = java.sql.Timestamp.from(all(7).warc_ts.toInstant.plusSeconds(3600)),
      text = "newer content wins")
    val delta = spark.createDataset((all.toSeq :+ dup).toIndexedSeq)
    val rep = EncodeJob.append(spark, delta, out, cfg).collect()
    assert(rep.map(_.n_rows).sum == 40, s"intra-delta dup must collapse: ${rep.toSeq}")

    val decoded = DecodeJob.run(spark, out).collect()
    assert(decoded.length == 40 && decoded.map(_.url).distinct.length == 40)
    val winner = decoded.find(_.url == all(7).url).get
    assert(winner.text == "newer content wins" && winner.warc_ts == dup.warc_ts)

    // re-delivering the same (duplicated) delta is still a no-op
    assert(EncodeJob.append(spark, delta, out, cfg).collect().isEmpty)
  }

  test("compact: append fragmentation is rewritten away; decode bit-identical") {
    import spark.implicits._
    val out = tmpDir("compact")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 16)
    val all = PagesGen.generate(spark, 130, partitions = 2).collect()

    EncodeJob.run(spark, spark.createDataset(all.take(100).toIndexedSeq), out, cfg)
    // three tiny appends fragment the partitions with tail chunks
    Seq(100 until 110, 110 until 120, 120 until 130).foreach { r =>
      EncodeJob.append(spark, spark.createDataset(r.map(all).toIndexedSeq), out, cfg)
    }
    def chunkGroups(): Long =
      spark.read.parquet(EncodeJob.chunksPath(out)).count()
    def decodedSorted(): Seq[(String, String, java.sql.Timestamp)] =
      DecodeJob.run(spark, out).collect().map(p => (p.url, p.text, p.warc_ts)).sortBy(_._1).toSeq

    val before = decodedSorted()
    val fragmented = chunkGroups()
    assert(before.length == 130)

    val rep = EncodeJob.compact(spark, out, cfg).collect()
    assert(rep.map(_.n_rows).sum == 130)
    val compacted = chunkGroups()
    assert(compacted < fragmented,
      s"compaction must reduce chunk count: $fragmented -> $compacted")
    // rows bit-identical; ranges consistent for lookups; lineage replaced
    assert(decodedSorted() == before)
    val hit = DecodeJob.lookupUrls(spark, out, Seq(all(105).url)).collect()
    assert(hit.length == 1 && hit.head.text == all(105).text)
    val lineage = spark.read.parquet(EncodeJob.lineagePath(out))
      .as[LineageRecord].collect()
    assert(lineage.length == lineage.map(_.part_id).distinct.length,
      "compaction must replace, not append, lineage rows")
    assert(lineage.map(_.n_rows).sum == 130)
    // appending an already-present slice is STILL a no-op after compaction
    assert(EncodeJob.append(spark,
      spark.createDataset(all.slice(100, 120).toIndexedSeq), out, cfg).collect().isEmpty)
  }

  test("compact emits byte-identical chunks to a fresh encode, with no Exchange in its plan") {
    import spark.implicits._
    val out = tmpDir("compact_ident")
    val fresh = tmpDir("compact_fresh")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 16)
    val all = PagesGen.generate(spark, 130, partitions = 2).collect()

    EncodeJob.run(spark, spark.createDataset(all.take(100).toIndexedSeq), out, cfg)
    Seq(100 until 110, 110 until 120, 120 until 130).foreach { r =>
      EncodeJob.append(spark, spark.createDataset(r.map(all).toIndexedSeq), out, cfg)
    }

    // the pipeline plan is pure narrow: union of coalesced per-dir scans,
    // in-partition sort, kernels — no Exchange node anywhere
    val plan = EncodeJob.compactedChunkStream(spark, out, cfg, Seq(0, 1), reencode = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction plan must not shuffle:\n$plan")

    EncodeJob.compact(spark, out, cfg)
    // body reuse (no BWT re-run) must reproduce EXACTLY what a fresh
    // bootstrap encode of the same 130 pages produces — per-chunk,
    // per-column payload hashes equal, not just decode equality
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), fresh, cfg)
    assert(chunkHashMap(out) == chunkHashMap(fresh),
      "compacted chunks must be byte-identical to a fresh encode")
    // and the recomputed lineage matches the fresh run's kernel-streamed one
    val a = spark.read.parquet(EncodeJob.lineagePath(out))
      .as[LineageRecord].collect().sortBy(_.part_id).toSeq
    val b = spark.read.parquet(EncodeJob.lineagePath(fresh))
      .as[LineageRecord].collect().sortBy(_.part_id).toSeq
    assert(a == b, s"recomputed lineage diverged:\n$a\nvs\n$b")
  }

  test("fragmentation-aware compaction rewrites only the fragmented partitions") {
    import spark.implicits._
    val out = tmpDir("compact_frag")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 240, partitions = 4).collect()
    val pidOf: Map[String, Int] = spark.createDataset(all.toIndexedSeq)
      .withColumn("part_id", EncodeJob.partIdCol(cfg))
      .select($"url", $"part_id").as[(String, Int)].collect().toMap
    val targetPid = all.groupBy(p => pidOf(p.url)).maxBy(_._2.length)._1
    val (target, rest) = all.partition(p => pidOf(p.url) == targetPid)
    assert(target.length >= 12, s"need enough rows in part $targetPid")

    // bootstrap everything except 9 target-part rows; three tiny appends
    // fragment ONLY the target partition
    val held = target.takeRight(9)
    EncodeJob.run(spark,
      spark.createDataset((rest ++ target.dropRight(9)).toIndexedSeq), out, cfg)
    held.grouped(3).foreach { g =>
      EncodeJob.append(spark, spark.createDataset(g.toIndexedSeq), out, cfg)
    }

    val frag = EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0)
    assert(frag == Seq(targetPid),
      s"only part $targetPid was fragmented, selection said $frag")

    def filesOf(pid: Int): Set[String] = {
      val d = new java.io.File(s"${EncodeJob.chunksPath(out)}/part_id=$pid")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => s"${f.getName}:${f.length}").toSet
    }
    val untouched = (0 until 4).filterNot(_ == targetPid)
    val before = untouched.map(p => p -> filesOf(p)).toMap
    val decodedBefore = DecodeJob.run(spark, out).collect().map(_.url).sorted.toSeq

    val rep = EncodeJob.compact(spark, out, cfg, partIds = Some(frag)).collect()
    assert(rep.map(_.part_id).toSeq == Seq(targetPid))
    untouched.foreach { p =>
      assert(filesOf(p) == before(p), s"partition $p must not be rewritten")
    }
    assert(DecodeJob.run(spark, out).collect().map(_.url).sorted.toSeq == decodedBefore)
    // selection is empty once compacted
    assert(EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0).isEmpty)
  }

  test("interrupted compaction swap: readers fail fast, writers roll forward") {
    import spark.implicits._
    val out = tmpDir("compact_crash")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 16)
    val all = PagesGen.generate(spark, 80, partitions = 2).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    val before = DecodeJob.run(spark, out).collect()
      .map(p => (p.url, p.text)).sorted.toSeq

    // manufacture the crash window: staging fully committed (here: a copy
    // of the live partition dirs), _SWAP marker written, then "crash" after
    // one live dir was deleted but before its staged replacement renamed in
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(EncodeJob.compactTmpPath(out))
    (0 until 2).foreach { pid =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(EncodeJob.chunksPath(out), s"part_id=$pid"),
        fs, new org.apache.hadoop.fs.Path(tmp, s"part_id=$pid"), false, conf)
    }
    // a COMMITTED marker carries the `;` terminator sentinel (writeSwapMarker
    // renames it in atomically; a sentinel-less file is pre-commit junk)
    val marker = fs.create(new org.apache.hadoop.fs.Path(tmp, "_SWAP"), true)
    marker.write("0,1;".getBytes(UTF_8))
    marker.close()
    fs.delete(new org.apache.hadoop.fs.Path(EncodeJob.chunksPath(out), "part_id=0"), true)

    // a reader now sees a half-swapped table: it must refuse, not drop rows
    val ex = intercept[IllegalArgumentException](DecodeJob.run(spark, out).collect())
    assert(ex.getMessage.contains("interrupted compaction"))

    // any write entry point repairs first; append() here both rolls the
    // swap forward and then lands its delta
    val extra = PagesGen.generate(spark, 90, partitions = 2).collect().drop(80)
    EncodeJob.append(spark, spark.createDataset(extra.toIndexedSeq), out, cfg)
    assert(!fs.exists(tmp), "staging dir must be gone after roll-forward")
    val after = DecodeJob.run(spark, out).collect().map(p => (p.url, p.text)).sorted.toSeq
    assert(after == (before ++ extra.map(p => (p.url, p.text))).sorted.toSeq)
    // lineage was recomputed for the rolled-forward parts: totals consistent
    val lin = spark.read.parquet(EncodeJob.lineagePath(out)).as[LineageRecord].collect()
    assert(lin.map(_.n_rows).sum == after.length)

    // pre-marker staging junk (crash DURING staging) is inert: readers work
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp, "part_id=0"))
    assert(DecodeJob.run(spark, out).count() == after.length)
    EncodeJob.compact(spark, out, cfg) // and the next compact discards it
    assert(!fs.exists(tmp))
  }

  test("crashed lineage swap rolls forward; compact re-slices with the STORED chunkRows") {
    import spark.implicits._
    val out = tmpDir("lineage_swap")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 160, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.take(120).toIndexedSeq), out, cfg)
    // two small appends: each adds an undersized tail chunk per partition,
    // so actual chunks exceed the ideal count and fragmentation is real
    all.drop(120).grouped(20).foreach { g =>
      EncodeJob.append(spark, spark.createDataset(g.toIndexedSeq), out, cfg)
    }
    val fullLineageRows = spark.read.parquet(EncodeJob.lineagePath(out)).count()

    // simulate a crash inside replaceLineageRows' delete->rename window:
    // _lineage is gone, the complete _swap_tmp is the only copy
    val conf = spark.sparkContext.hadoopConfiguration
    val lp = new org.apache.hadoop.fs.Path(EncodeJob.lineagePath(out))
    val fs = lp.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(EncodeJob.lineagePath(out) + "_swap_tmp")
    assert(fs.rename(lp, tmp))

    // a partial compact must NOT lose the other partitions' lineage rows
    // (before the roll-forward fix, kept = empty and only the compacted
    // partition's row survived)
    val frag = EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0)
    assert(frag.nonEmpty)
    val target = frag.head
    EncodeJob.compact(spark, out, cfg, partIds = Some(Seq(target)))
    val lin = spark.read.parquet(EncodeJob.lineagePath(out)).as[LineageRecord].collect()
    // the compacted part's rows collapse to one; every OTHER part's rows
    // must survive the crashed swap (before the roll-forward fix, kept was
    // empty and only the compacted partition's row remained)
    assert(lin.count(_.part_id == target) == 1)
    assert(lin.map(_.part_id).distinct.sorted.toSeq == Seq(0, 1, 2, 3),
      s"non-compacted partitions' lineage lost: ${lin.toSeq}")
    // the untouched parts' append-generation rows survive the crashed swap
    // FOLDED (one row per part, sums preserved — before the roll-forward
    // fix the kept set was empty and the sum collapsed to the compacted
    // partition's rows alone)
    assert(lin.map(_.n_rows).sum == 160,
      s"rows of untouched parts must survive the crashed swap " +
        s"(full table had $fullLineageRows lineage rows pre-crash)")
    assert(lin.length == 4, s"folding keeps lineage at one row per part: ${lin.toSeq}")

    // compacting with a DIVERGENT cfg.chunkRows must keep the stored
    // layout (meta.chunkRows), or the fragmentation metric would read the
    // whole table as fragmented forever
    EncodeJob.compact(spark, out, cfg.copy(chunkRows = 4))
    assert(EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0).isEmpty,
      "compact must re-slice with the stored chunkRows, not the caller's")
    assert(DecodeJob.run(spark, out).count() == 160)
  }

  test("delete: urls removed partition-locally; untouched partitions keep their files") {
    import spark.implicits._
    val out = tmpDir("delete")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 160, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    val pidOf: Map[String, Int] = spark.createDataset(all.toIndexedSeq)
      .withColumn("part_id", EncodeJob.partIdCol(cfg))
      .select($"url", $"part_id").as[(String, Int)].collect().toMap

    // delete a handful of urls all living in ONE home partition
    val targetPid = all.groupBy(p => pidOf(p.url)).maxBy(_._2.length)._1
    val doomed = all.filter(p => pidOf(p.url) == targetPid).take(5).map(_.url).toSeq
    def filesOf(pid: Int): Set[String] = {
      val d = new java.io.File(s"${EncodeJob.chunksPath(out)}/part_id=$pid")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => s"${f.getName}:${f.length}").toSet
    }
    val untouched = (0 until 4).filterNot(_ == targetPid)
    val before = untouched.map(p => p -> filesOf(p)).toMap

    val rep = EncodeJob.delete(spark, out, doomed, cfg).collect()
    assert(rep.map(_.part_id).toSeq == Seq(targetPid))
    untouched.foreach(p => assert(filesOf(p) == before(p), s"partition $p must not be rewritten"))
    val decoded = DecodeJob.run(spark, out).collect()
    assert(decoded.length == 155)
    assert(doomed.forall(u => !decoded.exists(_.url == u)))
    // remaining content bit-identical
    val expect = all.filterNot(p => doomed.contains(p.url)).map(p => (p.url, p.text)).sorted.toSeq
    assert(decoded.map(p => (p.url, p.text)).sorted.toSeq == expect)
    // lineage totals reflect the removal
    val lin = spark.read.parquet(EncodeJob.lineagePath(out)).as[LineageRecord].collect()
    assert(lin.map(_.n_rows).sum == 155)
    // deleting absent urls is a no-op that rewrites nothing
    assert(EncodeJob.delete(spark, out, doomed, cfg).collect().isEmpty)
    // deleted urls can be re-ingested (absent, not banned)
    EncodeJob.append(spark,
      spark.createDataset(all.filter(p => doomed.contains(p.url)).toIndexedSeq), out, cfg)
    assert(DecodeJob.run(spark, out).count() == 160)
  }

  test("delete: emptying a partition drops its dir; a zero-row tombstone blocks resume resurrection") {
    import spark.implicits._
    val out = tmpDir("delete_all")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 120, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    val pidOf: Map[String, Int] = spark.createDataset(all.toIndexedSeq)
      .withColumn("part_id", EncodeJob.partIdCol(cfg))
      .select($"url", $"part_id").as[(String, Int)].collect().toMap
    val targetPid = all.groupBy(p => pidOf(p.url)).minBy(_._2.length)._1
    val doomed = all.filter(p => pidOf(p.url) == targetPid).map(_.url).toSeq

    EncodeJob.delete(spark, out, doomed, cfg)
    assert(!new java.io.File(s"${EncodeJob.chunksPath(out)}/part_id=$targetPid").exists(),
      "an emptied partition's directory must be removed")
    val lin = spark.read.parquet(EncodeJob.lineagePath(out)).as[LineageRecord].collect()
    val tomb = lin.filter(_.part_id == targetPid)
    assert(tomb.length == 1 && tomb.head.n_rows == 0 && tomb.head.status == "done",
      s"an emptied partition must keep a zero-row tombstone, got ${tomb.toSeq}")
    assert(DecodeJob.run(spark, out).count() == 120 - doomed.length)

    // the tombstone makes takedowns durable against resume: re-running the
    // bootstrap with the ORIGINAL input must NOT resurrect the deleted urls
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    assert(DecodeJob.run(spark, out).count() == 120 - doomed.length,
      "resume must not re-encode an intentionally-emptied partition")
  }

  test("delete of EVERY url leaves a readable empty table that can bootstrap again") {
    import spark.implicits._
    val out = tmpDir("delete_wipe")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 16)
    val all = PagesGen.generate(spark, 60, partitions = 2).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)

    // full wipe: no pending swap left behind, readers see an EMPTY table
    // (not a schema-inference crash), lineage is all tombstones
    EncodeJob.delete(spark, out, all.map(_.url).toSeq, cfg)
    assert(DecodeJob.run(spark, out).count() == 0)
    assert(DecodeJob.lookupUrls(spark, out, Seq(all.head.url)).count() == 0)
    assert(DecodeJob.decodeColumn(spark, out, "text").count() == 0)
    assert(DecodeJob.decodeProjected(spark, out, Seq("text")).count() == 0)
    val lin = spark.read.parquet(EncodeJob.lineagePath(out)).as[LineageRecord].collect()
    assert(lin.nonEmpty && lin.forall(r => r.n_rows == 0 && r.status == "done"))

    // tombstones are STRICT: a resume-style re-run of the ORIGINAL input
    // must not resurrect anything, even when every partition was wiped
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    assert(DecodeJob.run(spark, out).count() == 0,
      "resume must not resurrect a fully-wiped table")

    // verify can confirm the wipe (empty source + empty table: no NPE)
    val rep = VerifyJob.run(spark,
      spark.emptyDataset(org.apache.spark.sql.Encoders.product[Page]), out)
    assert(rep.rows_decoded == 0 && rep.mismatched_rows == 0 && rep.size_gate_ok)

    // even with _meta lost (legacy / writeMeta crash window), new data
    // must land — the tombstones must not misroute the delta into run()'s
    // done-skip where it would silently vanish
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(EncodeJob.metaPath(out)), true)
    EncodeJob.append(spark, spark.createDataset(all.take(30).toIndexedSeq), out, cfg)
    assert(DecodeJob.run(spark, out).count() == 30,
      "append into a wiped meta-less table must not lose the delta")
  }

  test("upsert: delta wins over stored rows; re-running the same upsert is stable") {
    import spark.implicits._
    val out = tmpDir("upsert")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 120, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)

    // plain append of a re-crawl is dropped (insert-only)...
    val recrawl = all.take(10).map(p => p.copy(
      warc_ts = java.sql.Timestamp.from(p.warc_ts.toInstant.plusSeconds(3600)),
      text = "refreshed " + p.text))
    assert(EncodeJob.append(spark, spark.createDataset(recrawl.toIndexedSeq), out, cfg)
      .collect().isEmpty)
    assert(!DecodeJob.run(spark, out).collect().exists(_.text.startsWith("refreshed ")))

    // ...upsert makes the newer rows win
    EncodeJob.upsert(spark, spark.createDataset(recrawl.toIndexedSeq), out, cfg)
    val decoded = DecodeJob.run(spark, out).collect()
    assert(decoded.length == 120)
    recrawl.foreach { r =>
      val d = decoded.find(_.url == r.url).get
      assert(d.text == r.text && d.warc_ts == r.warc_ts, s"upsert must win for ${r.url}")
    }
    // idempotent on redelivery: same upsert again -> same table content
    EncodeJob.upsert(spark, spark.createDataset(recrawl.toIndexedSeq), out, cfg)
    val again = DecodeJob.run(spark, out).collect().map(p => (p.url, p.text)).sorted.toSeq
    assert(again == decoded.map(p => (p.url, p.text)).sorted.toSeq)
    // untouched rows still bit-identical
    val keptExpect = all.drop(10).map(p => (p.url, p.text)).sorted.toSeq
    assert(again.filterNot(t => recrawl.exists(_.url == t._1)) == keptExpect)
  }

  test("presence check joins on the part_id equi-key (hash join, not nested-loop)") {
    val out = tmpDir("presence_plan")
    val cfg = EncodeConfig(numPartitions = 3, chunkRows = 32)
    EncodeJob.run(spark, PagesGen.generate(spark, 120, partitions = 3), out, cfg)
    val urls = DecodeJob.run(spark, out).select("url").limit(30)
      .collect().map(_.getString(0)).toSeq
    val meta = EncodeJob.readMeta(spark, out)
    assert(meta.isDefined)
    // with stored meta every target carries its home pid: part_id must be
    // extracted as an EQUI key (each chunk row probes only its partition's
    // urls — O(urls/P)); a nested-loop join here scans the WHOLE url set
    // per chunk row, a P-fold loss at delete-batch scale
    val (covering, _) = EncodeJob.presenceScan(spark, out, urls, meta)
    val plan = covering.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on part_id, got:\n$plan")
    assert(!plan.contains("NestedLoop"), s"presence check degraded to nested-loop:\n$plan")
    // pre-meta fallback keeps working (range-only: nested-loop is all there is)
    val (coveringNoMeta, _) = EncodeJob.presenceScan(spark, out, urls, None)
    assert(coveringNoMeta.count() > 0)
  }

  test("lookupUrls rejects url sets beyond the point-read cap") {
    val out = tmpDir("lookup_cap")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 32)
    // 200 stored urls -> the hit-path lookup below spans multiple scan
    // batches, and chunkRows=32 makes single chunks cover urls from two
    // batches (the double-decode dedup edge)
    EncodeJob.run(spark, PagesGen.generate(spark, 200, partitions = 2), out, cfg)
    val urls = (0 until DecodeJob.MaxLookupUrls + 1).map(i => s"https://h$i.example/")
    val ex = intercept[IllegalArgumentException](DecodeJob.lookupUrls(spark, out, urls))
    assert(ex.getMessage.contains("decodeUrlRange"))
    // at the cap it still works — and stays whole-stage-codegen'd: with
    // fallback disabled, a single 256-url OR predicate would blow the JVM's
    // 64 KB generated-method limit and THROW here; the batched scans must not
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(DecodeJob.lookupUrls(spark, out, urls.take(DecodeJob.MaxLookupUrls)).count() == 0)
      // hit path too (stored urls), not just the empty result
      val stored = DecodeJob.run(spark, out).select("url").limit(200)
        .collect().map(_.getString(0)).toSeq
      assert(DecodeJob.lookupUrls(spark, out, stored).count() == stored.distinct.size)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("an uncommitted _meta dir reads as absent and is rewritten, not wedged") {
    import spark.implicits._
    val out = tmpDir("meta_crash")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 32)
    val pages = PagesGen.generate(spark, 40, partitions = 2)
    EncodeJob.run(spark, pages, out, cfg)
    assert(EncodeJob.readMeta(spark, out).nonEmpty)

    // simulate a crash inside writeMeta's delete-then-rewrite window
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(EncodeJob.metaPath(out)), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(EncodeJob.metaPath(out)))
    assert(EncodeJob.readMeta(spark, out).isEmpty, "empty _meta must read as absent")
    // reads survive (range-only pruning), writes heal the meta table
    assert(DecodeJob.lookupUrls(spark, out, Seq("https://nope.example/")).count() == 0)
    EncodeJob.run(spark, pages, out, cfg)
    assert(EncodeJob.readMeta(spark, out).contains(
      EncodeJob.EncodeMeta(cfg.numPartitions, cfg.saltFactor, cfg.chunkRows)))
  }

  test("decodeProjected: only requested leaves read; values exact; lookup works after append") {
    import spark.implicits._
    val out = tmpDir("projected")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 32)
    val all = PagesGen.generate(spark, 120, partitions = 4).collect()

    // bootstrap an incrementally-built table purely through append
    assert(EncodeJob.append(spark, spark.createDataset(all.take(80).toIndexedSeq), out, cfg)
      .collect().nonEmpty)
    assert(EncodeJob.append(spark, spark.createDataset(all.drop(80).toIndexedSeq), out, cfg)
      .collect().nonEmpty)

    // projected decode: exact url->text map, html leaf absent from the
    // actual parquet scan's ReadSchema (the projectedScan plan — the outer
    // DataFrame is an ExistingRDD that hides the scan)
    val proj = DecodeJob.decodeProjected(spark, out, Seq("text", "warc_ts"))
    assert(proj.columns.toSeq == Seq("url", "warc_ts_us", "text"))
    val scan = DecodeJob.projectedScan(spark, out, Seq("text", "warc_ts"))
      .queryExecution.executedPlan.toString()
    assert(scan.contains("ReadSchema") && !scan.contains("html"),
      s"html leaf must be pruned out of the parquet scan:\n$scan")
    val got = proj.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size == 120)
    all.foreach { p =>
      val (ts, text) = got(p.url)
      assert(text == p.text && ts == Math.floorDiv(p.warc_ts.getTime, 1000L) * 1000000L +
        p.warc_ts.getNanos / 1000L)
    }

    // point lookup spans chunks from BOTH append generations
    val wanted = Seq(all(10), all(100))
    val looked = DecodeJob.lookupUrls(spark, out, wanted.map(_.url)).collect()
      .map(p => p.url -> p.text).toMap
    assert(looked == wanted.map(p => p.url -> p.text).toMap)
  }

  test("writer lease: a second concurrent writer fails loudly; orphans break manually or by staleness") {
    import spark.implicits._
    val out = tmpDir("lock")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 32)
    val all = PagesGen.generate(spark, 40, partitions = 2).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)

    // writer A holds the lease on another thread; writer B's append must
    // fail with the named error instead of racing chunk-id allocation
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val a = new Thread(() =>
      EncodeJob.withWriterLock(spark, out) { entered.countDown(); release.await() })
    a.start()
    entered.await()
    try {
      val ex = intercept[IllegalStateException](
        EncodeJob.append(spark, spark.createDataset(all.take(5).toIndexedSeq), out, cfg))
      assert(ex.getMessage.contains("another writer holds the lease"))
    } finally { release.countDown(); a.join() }

    // lease released -> writes work again (delete takes + releases it too)
    assert(EncodeJob.delete(spark, out, Seq(all.head.url), cfg).collect().nonEmpty)

    // an orphaned FRESH lock (crashed writer) blocks until broken by hand
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val lock = EncodeJob.writerLockPath(out)
    val os = fs.create(lock, false); os.write("app=dead".getBytes(UTF_8)); os.close()
    intercept[IllegalStateException](EncodeJob.compact(spark, out, cfg))
    // the denied acquisition must not leak this thread's in-JVM entry: a
    // retry from the SAME thread must fail the same way, not silently
    // bypass the FS lock via the reentrant fast path
    intercept[IllegalStateException](EncodeJob.compact(spark, out, cfg))
    assert(EncodeJob.breakWriterLock(spark, out))
    EncodeJob.compact(spark, out, cfg)

    // a STALE orphan self-heals on the next acquisition
    val os2 = fs.create(lock, false); os2.write("app=dead".getBytes(UTF_8)); os2.close()
    fs.setTimes(lock, System.currentTimeMillis() - EncodeJob.StaleWriterLockMs - 60000, -1)
    EncodeJob.compact(spark, out, cfg) // auto-breaks and proceeds
    assert(!fs.exists(lock), "the lease must be released after the write")
    assert(DecodeJob.run(spark, out).count() == 39)

    // release never deletes a lock that is not provably OURS: a readable
    // file with no uuid line (foreign fence / partially-visible create)
    // must survive the release, unlike a missing or transiently-unreadable
    // one
    EncodeJob.withWriterLock(spark, out) {
      fs.delete(lock, false)
      val fo = fs.create(lock, false); fo.write("app=fence".getBytes(UTF_8)); fo.close()
    }
    assert(fs.exists(lock), "a uuid-less foreign lock must survive another writer's release")
    assert(EncodeJob.breakWriterLock(spark, out))

    // an AGED aside-file orphaned by a breaker crash (rename done, delete
    // not) is swept by the next successful acquisition; a FRESH one may be
    // a contender's in-flight capture and must survive
    val orphan = new org.apache.hadoop.fs.Path(out, "_writer.lock.stale.deadbeef")
    val os3 = fs.create(orphan, false); os3.write("app=dead".getBytes(UTF_8)); os3.close()
    EncodeJob.compact(spark, out, cfg)
    assert(fs.exists(orphan), "a fresh aside file (possible in-flight capture) must survive the sweep")
    fs.setTimes(orphan, System.currentTimeMillis() - EncodeJob.StaleWriterLockMs - 60000, -1)
    EncodeJob.compact(spark, out, cfg)
    assert(!fs.exists(orphan), "an aged orphaned aside file must be swept")
  }

  test("describe reports table health without locking, even mid-swap or under a held lease") {
    import spark.implicits._
    val out = tmpDir("health")
    // absent table -> all zeros, no flags
    assert(EncodeJob.describe(spark, out).head() ==
      TableHealth(0, 0, 0, 0, 0, 0, 0, false, false))

    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 8)
    val all = PagesGen.generate(spark, 48, partitions = 2).collect()
    EncodeJob.run(spark, spark.createDataset(all.take(24).toIndexedSeq), out, cfg)
    (0 until 3).foreach { i =>
      EncodeJob.append(spark,
        spark.createDataset(all.slice(24 + 8 * i, 32 + 8 * i).toIndexedSeq), out, cfg)
    }
    val mid = EncodeJob.describe(spark, out).head()
    assert(mid.n_rows == 48 && mid.n_partitions == 2 && mid.chunk_rows == 8)
    assert(mid.n_parts_live == 2)
    assert(mid.fragmented_parts == EncodeJob.fragmentedPartIds(spark, out, cfg).length,
      "describe must agree with the compaction selector")
    // ... at EVERY slack, not just the default (shared predicate)
    assert(EncodeJob.describe(spark, out, cfg, slackChunks = 0).head().fragmented_parts ==
      EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0).length)
    assert(!mid.pending_swap && !mid.writer_lease_held)

    // health stays readable while a writer holds the lease and while a
    // swap is pending — exactly the states every other reader refuses
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val lock = EncodeJob.writerLockPath(out)
    val osL = fs.create(lock, false); osL.write("app=x".getBytes(UTF_8)); osL.close()
    assert(EncodeJob.describe(spark, out).head().writer_lease_held)
    fs.delete(lock, false)
    val tmp = new org.apache.hadoop.fs.Path(EncodeJob.compactTmpPath(out))
    fs.mkdirs(tmp)
    val mk = fs.create(new org.apache.hadoop.fs.Path(tmp, "_SWAP"), true)
    mk.write("0;".getBytes(UTF_8)); mk.close()
    intercept[IllegalArgumentException](DecodeJob.run(spark, out).count())
    assert(EncodeJob.describe(spark, out).head().pending_swap)
    fs.delete(tmp, true)

    // compaction quiesces the layout: same rows, fewer (or equal) chunks,
    // zero fragmentation
    EncodeJob.compact(spark, out, cfg)
    val fin = EncodeJob.describe(spark, out).head()
    assert(fin.n_rows == 48 && fin.fragmented_parts == 0 && !fin.pending_swap)
    assert(fin.n_chunks <= mid.n_chunks)
  }

  test("upsert is per-url atomic: old until the swap, new right after; a crash at the marker rolls forward") {
    import spark.implicits._
    val out = tmpDir("upsert_atomic")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 120, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    def bump(p: Page, v: String) = p.copy(
      warc_ts = java.sql.Timestamp.from(p.warc_ts.toInstant.plusSeconds(3600)),
      text = s"$v ${p.text}")
    val refreshed = all.take(8).map(bump(_, "v2"))
    val oldText = all.take(8).map(p => p.url -> p.text).toMap

    // read the table through the PUBLIC read path at each commit phase
    val seen = scala.collection.mutable.Map.empty[String, Map[String, String]]
    EncodeJob.upsertPhaseHook = {
      case ph @ ("staged" | "swapped") =>
        seen(ph) = DecodeJob.lookupUrls(spark, out, refreshed.map(_.url).toSeq)
          .collect().map(p => p.url -> p.text).toMap
      case _ => ()
    }
    try EncodeJob.upsert(spark, spark.createDataset(refreshed.toIndexedSeq), out, cfg)
    finally EncodeJob.upsertPhaseHook = _ => ()
    assert(seen("staged") == oldText,
      "before the swap commit a reader must see the OLD versions (never absent)")
    assert(seen("swapped") == refreshed.map(p => p.url -> p.text).toMap,
      "right after the swap a reader must see the NEW versions")
    // the rewrite folds the delta INTO the re-slice: upsert leaves its
    // partitions perfectly laid out, not fragmented with tail chunks
    assert(EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0).isEmpty,
      "upsert must defragment the partitions it touches")

    // crash right after the swap intent is recorded: readers fail fast,
    // the roll-forward lands the new rows, nothing is ever 'neither'
    val refreshed2 = all.slice(20, 26).map(bump(_, "v3"))
    EncodeJob.upsertPhaseHook =
      ph => if (ph == "marked") throw new RuntimeException("injected crash at marker")
    try intercept[RuntimeException](
      EncodeJob.upsert(spark, spark.createDataset(refreshed2.toIndexedSeq), out, cfg))
    finally EncodeJob.upsertPhaseHook = _ => ()
    intercept[IllegalArgumentException](DecodeJob.run(spark, out))
    assert(EncodeJob.completePendingCompactSwap(spark, out))
    val after = DecodeJob.run(spark, out).collect().map(p => p.url -> p.text).toMap
    assert(after.size == 120)
    refreshed2.foreach(r => assert(after(r.url) == r.text,
      s"rolled-forward upsert must show the new version of ${r.url}"))
    // re-running the same upsert over the repaired table is a stable no-op
    EncodeJob.upsert(spark, spark.createDataset(refreshed2.toIndexedSeq), out, cfg)
    assert(DecodeJob.run(spark, out).count() == 120)
  }

  test("upsert's rewrite is byte-identical to a fresh encode of the final rows; plan exchange-free; pre-marker crash is inert") {
    import spark.implicits._
    val out = tmpDir("upsert_ident")
    val fresh = tmpDir("upsert_fresh")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 16)
    val all = PagesGen.generate(spark, 130, partitions = 2).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    def bump(p: Page) = p.copy(
      warc_ts = java.sql.Timestamp.from(p.warc_ts.toInstant.plusSeconds(1800)),
      text = "fresh " + p.text)
    val delta = all.take(12).map(bump)

    // pin the rewrite-with-delta pipeline's plan from inside the commit
    // window (the delta temp table only exists there): union of coalesced
    // per-dir scans + in-partition sort + kernels — no Exchange anywhere
    var rewritePlan = ""
    EncodeJob.upsertPhaseHook = {
      case "staged" if rewritePlan.isEmpty =>
        val pids = spark.createDataset(delta.toIndexedSeq)
          .withColumn("part_id", EncodeJob.partIdCol(cfg))
          .select($"part_id").distinct().as[Int].collect().toSeq.sorted
        rewritePlan = EncodeJob.compactedChunkStream(spark, out, cfg, pids,
          reencode = false, dropUrls = delta.map(_.url).toSet,
          deltaDir = Some(EncodeJob.chunksPath(out) + "_upsert_delta_tmp"))
          .queryExecution.executedPlan.toString
      case _ => ()
    }
    try EncodeJob.upsert(spark, spark.createDataset(delta.toIndexedSeq), out, cfg)
    finally EncodeJob.upsertPhaseHook = _ => ()
    assert(rewritePlan.nonEmpty && !rewritePlan.contains("Exchange"),
      s"upsert's rewrite plan must not shuffle:\n$rewritePlan")

    // the staged re-slice must reproduce EXACTLY what a fresh bootstrap
    // of the final logical rows produces — per-chunk, per-column payload
    // hashes, not just decode equality (same pin as compact's)
    EncodeJob.run(spark,
      spark.createDataset((delta ++ all.drop(12)).toIndexedSeq), fresh, cfg)
    assert(chunkHashMap(out) == chunkHashMap(fresh),
      "post-upsert chunks must be byte-identical to a fresh encode of the final rows")
    val a = spark.read.parquet(EncodeJob.lineagePath(out))
      .as[LineageRecord].collect().sortBy(_.part_id).toSeq
    val b = spark.read.parquet(EncodeJob.lineagePath(fresh))
      .as[LineageRecord].collect().sortBy(_.part_id).toSeq
    assert(a == b, s"lineage diverged:\n$a\nvs\n$b")

    // a crash BEFORE the swap intent (staging fully written, no marker)
    // leaves the live table untouched and readers unblocked; the re-run
    // discards the stale staging and completes
    val delta2 = all.slice(30, 36).map(bump)
    EncodeJob.upsertPhaseHook =
      ph => if (ph == "staged") throw new RuntimeException("injected crash pre-marker")
    try intercept[RuntimeException](
      EncodeJob.upsert(spark, spark.createDataset(delta2.toIndexedSeq), out, cfg))
    finally EncodeJob.upsertPhaseHook = _ => ()
    val mid = DecodeJob.lookupUrls(spark, out, delta2.map(_.url).toSeq).collect()
      .map(p => p.url -> p.text).toMap
    assert(mid == all.slice(30, 36).map(p => p.url -> p.text).toMap,
      "pre-marker crash must leave the OLD versions live and readable")
    EncodeJob.upsert(spark, spark.createDataset(delta2.toIndexedSeq), out, cfg)
    val after = DecodeJob.lookupUrls(spark, out, delta2.map(_.url).toSeq).collect()
      .map(p => p.url -> p.text).toMap
    assert(after == delta2.map(p => p.url -> p.text).toMap)
  }

  test("upsert splits oversized deltas into bounded groups; the ceiling fails before any collect") {
    import spark.implicits._
    val out = tmpDir("upsert_groups")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 60, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, cfg)
    val refreshed = all.take(20).map(p => p.copy(
      warc_ts = java.sql.Timestamp.from(p.warc_ts.toInstant.plusSeconds(60)),
      text = "grp " + p.text))
    // brand-new urls alongside the refreshes: some groups take the
    // phase-3 APPEND path into partitions other groups already swapped,
    // which is exactly the absolute-vs-incremental record mix the
    // returned lineage must not be fooled by
    val novel = (0 until 12).map(i =>
      Page(s"https://grp-new.example/p$i", new java.sql.Timestamp(1000L * i),
        null, s"novel text $i", "en"))
    val delta = refreshed ++ novel
    // force the hash-group split path at spec scale (production: 100k)
    EncodeJob.upsertGroupSizeForTest = Some(4)
    val returned =
      try EncodeJob.upsert(spark, spark.createDataset(delta.toIndexedSeq), out, cfg)
        .collect().toSeq
      finally EncodeJob.upsertGroupSizeForTest = None
    val decoded = DecodeJob.run(spark, out).collect()
    assert(decoded.length == 72)
    delta.foreach(r =>
      assert(decoded.find(_.url == r.url).get.text == r.text, s"group upsert lost ${r.url}"))
    // the returned records are layout-final: one per touched partition,
    // row counts equal to what the chunk metadata actually holds (a
    // keep-last-record scheme would under-report a partition a later
    // group merely appended to after an earlier group's full rewrite)
    assert(returned.map(_.part_id).distinct.length == returned.length,
      "duplicate part ids in returned upsert lineage")
    val chunkRows = spark.read.parquet(EncodeJob.chunksPath(out))
      .groupBy($"part_id")
      .agg(org.apache.spark.sql.functions.sum($"n_rows").as("n"))
      .as[(Int, Long)].collect().toMap
    returned.foreach(r =>
      assert(r.n_rows == chunkRows(r.part_id),
        s"part ${r.part_id}: returned ${r.n_rows} rows, chunks hold ${chunkRows(r.part_id)}"))

    // the ceiling is enforced via limit+count BEFORE the driver-side url
    // collect: a delta far past it fails loudly without being materialized
    EncodeJob.maxUpsertUrlsForTest = Some(8)
    try {
      val big = spark.range(100000).map(i => Page(s"https://x.example/$i",
        new java.sql.Timestamp(0L), null, "t", "en"))
      val ex = intercept[IllegalArgumentException](EncodeJob.upsert(spark, big, out, cfg))
      assert(ex.getMessage.contains("bounded at 8"))
    } finally EncodeJob.maxUpsertUrlsForTest = None
  }

  test("upsert on a pre-meta foreign-layout table homes replacements at the STORED partition (never absent mid-commit)") {
    import spark.implicits._
    val out = tmpDir("upsert_premeta")
    val writeCfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 80, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.toIndexedSeq), out, writeCfg)
    // legacy table: stored meta lost, so home partitions are unknowable
    // from any cfg — only the stored location is authoritative
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(EncodeJob.metaPath(out)), true)
    // the caller's cfg computes DIFFERENT homes for most urls: before the
    // fix, a url whose cfg-home fell outside the stored-home set was
    // swapped away in phase 2 and only re-appended in phase 3 — a reader
    // (or crash) between the two saw it absent
    val callCfg = EncodeConfig(numPartitions = 7, chunkRows = 16)
    val refreshed = all.take(10).map(p => p.copy(
      warc_ts = java.sql.Timestamp.from(p.warc_ts.toInstant.plusSeconds(60)),
      text = "pm2 " + p.text))
    val seen = scala.collection.mutable.Map.empty[String, Map[String, String]]
    EncodeJob.upsertPhaseHook = {
      case ph @ "swapped" =>
        seen(ph) = DecodeJob.lookupUrls(spark, out, refreshed.map(_.url).toSeq)
          .collect().map(p => p.url -> p.text).toMap
      case _ => ()
    }
    try EncodeJob.upsert(spark, spark.createDataset(refreshed.toIndexedSeq), out, callCfg)
    finally EncodeJob.upsertPhaseHook = _ => ()
    assert(seen("swapped") == refreshed.map(p => p.url -> p.text).toMap,
      "every stored url must be PRESENT (new version) the moment the swap commits")
    val after = DecodeJob.run(spark, out).collect().map(p => p.url -> p.text).toMap
    assert(after.size == 80)
    refreshed.foreach(r => assert(after(r.url) == r.text))
  }

  test("a truncated swap marker is pre-commit junk, not a wedge") {
    val out = tmpDir("marker_trunc")
    val cfg = EncodeConfig(numPartitions = 2, chunkRows = 32)
    EncodeJob.run(spark, PagesGen.generate(spark, 40, partitions = 2), out, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    // fabricate a crash mid-marker-write: a token cut inside ':drop' and
    // no terminator sentinel (the atomic rename of a real commit makes
    // this impossible post-fix, but a legacy/corrupt file must not wedge)
    fs.mkdirs(new org.apache.hadoop.fs.Path(EncodeJob.compactTmpPath(out)))
    val os = fs.create(
      new org.apache.hadoop.fs.Path(EncodeJob.compactTmpPath(out), "_SWAP"), true)
    os.write("5:dr".getBytes(UTF_8)); os.close()
    // readers fail fast on the pending marker...
    intercept[IllegalArgumentException](DecodeJob.run(spark, out))
    // ...and repair discards it as junk instead of misparsing '5:dr'
    assert(!EncodeJob.completePendingCompactSwap(spark, out))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(EncodeJob.compactTmpPath(out))))
    assert(DecodeJob.run(spark, out).count() == 40, "live table stays canonical")
  }

  test("lineage stays O(partitions): compaction folds superseded per-append rows") {
    import spark.implicits._
    val out = tmpDir("lineage_fold")
    val cfg = EncodeConfig(numPartitions = 4, chunkRows = 16)
    val all = PagesGen.generate(spark, 200, partitions = 4).collect()
    EncodeJob.run(spark, spark.createDataset(all.take(40).toIndexedSeq), out, cfg)
    (1 to 8).foreach { k =>
      EncodeJob.append(spark,
        spark.createDataset(all.slice(40 + (k - 1) * 20, 40 + k * 20).toIndexedSeq), out, cfg)
    }
    val rowsBefore = spark.read.parquet(EncodeJob.lineagePath(out)).count()
    assert(rowsBefore > 4, s"appends must have accumulated per-batch lineage rows: $rowsBefore")

    // compacting even ONE partition folds every OTHER part's superseded
    // rows too (the whole lineage table is rewritten in that pass)
    val frag = EncodeJob.fragmentedPartIds(spark, out, cfg, slackChunks = 0)
    assert(frag.nonEmpty, "eight appends must fragment something")
    EncodeJob.compact(spark, out, cfg, partIds = Some(frag.take(1)))
    val lin = spark.read.parquet(EncodeJob.lineagePath(out)).as[LineageRecord].collect()
    assert(lin.map(_.part_id).distinct.length == lin.length,
      s"exactly one folded lineage row per partition, got ${lin.toSeq}")
    assert(lin.map(_.n_rows).sum == 200)
    assert(lin.forall(r => r.status == "done" && r.codecs.nonEmpty))
    // folding is metrics-preserving: resume bookkeeping and decode intact
    assert(EncodeJob.donePartIds(spark, out) == lin.map(_.part_id).toSet)
    assert(DecodeJob.run(spark, out).count() == 200)
  }

  test("decodeColumn provides the column-pruned read path") {
    import spark.implicits._
    val out = tmpDir("colprune")
    val pages = PagesGen.generate(spark, 80, partitions = 2)
    EncodeJob.run(spark, pages, out, EncodeConfig(numPartitions = 2, chunkRows = 32))
    val langs = DecodeJob.decodeColumn(spark, out, "lang")
      .map { case (_, _, _, v) => new String(v, UTF_8) }
      .collect().sorted
    val expected = pages.collect().map(_.lang).sorted
    assert(langs.toSeq == expected.toSeq)
  }
}
