package graft.tools

import graft.Bench
import graft.spark.{DecodeJob, EncodeConfig, EncodeJob, PagesGen}

/** Measures what the round-5 compaction redesign is worth: the same
  * fragmented table is compacted twice — body-reuse path (default) vs
  * `reencode = true` (decode + full per-value re-encode, the CPU cost the
  * old shuffle-based implementation paid on top of its exchange) — and the
  * compacted chunks are cross-checked byte-identical between the two.
  * Also prints the compaction pipeline's executed plan so BENCH/PLANS.md
  * carries the no-Exchange evidence.
  *
  *   SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.CompactAb 160000"
  */
object CompactAb {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 160000L
    val spark = Bench.newSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val base = "/dev/shm/graft_bench/compact_ab"
    val cfg = EncodeConfig(numPartitions = 64, saltFactor = 8)
    var failed = false
    try {
      // deterministic doc-id RANGES, generated distributively — collecting
      // the corpus to the driver would blow maxResultSize at soak scale
      def pageRange(from: Long, until: Long) = {
        import spark.implicits._
        spark.range(from, until, 1, 64)
          .map(id => PagesGen.page(42L, id, 100, hostSkew = true))
      }
      def buildFragmented(out: String): Unit = {
        Bench.deleteDir(out)
        // bootstrap 70%, then three ~10% appends -> tail-chunk fragmentation
        val cut = nPages * 7 / 10
        EncodeJob.run(spark, pageRange(0, cut), out, cfg)
        val step = math.max(1L, (nPages - cut + 2) / 3)
        var lo = cut
        while (lo < nPages) {
          EncodeJob.append(spark, pageRange(lo, math.min(nPages, lo + step)), out, cfg)
          lo += step
        }
      }
      def chunkHashes(out: String): Map[(Int, Int), Long] =
        spark.read.parquet(EncodeJob.chunksPath(out))
          .select($"part_id", $"chunk_id",
            ($"url.payload_hash".bitwiseXOR($"warc_ts.payload_hash")
              .bitwiseXOR($"html.payload_hash").bitwiseXOR($"text.payload_hash")
              .bitwiseXOR($"lang.payload_hash")).as("h"))
          .as[(Int, Int, Long)].collect().map { case (p, c, h) => (p, c) -> h }.toMap

      // GRAFT_SKIP_REENCODE=1 runs only the reuse arm (for soak-scale rows
      // where the re-encode arm's cost is the already-measured ~7x)
      val skipReencode = sys.env.get("GRAFT_SKIP_REENCODE").contains("1")
      val outA = s"$base/reuse"
      val outB = s"$base/reencode"
      buildFragmented(outA)
      if (!skipReencode) buildFragmented(outB)
      val frag = EncodeJob.fragmentedPartIds(spark, outA, cfg, slackChunks = 0)
      println(s"COMPACT_AB pages=$nPages fragmented_parts=${frag.size}/${cfg.numPartitions}")
      if (frag.isEmpty) {
        println("COMPACT_AB nothing fragmented; nothing to measure")
        return
      }

      println("COMPACT_AB plan (reuse path):")
      println(EncodeJob.compactedChunkStream(spark, outA, cfg, frag, reencode = false)
        .queryExecution.executedPlan.toString())

      val t0 = System.nanoTime()
      EncodeJob.compact(spark, outA, cfg, Some(frag))
      val reuseSec = (System.nanoTime() - t0) / 1e9
      val reencSec = if (skipReencode) Double.NaN else {
        val t1 = System.nanoTime()
        EncodeJob.compact(spark, outB, cfg, Some(frag), reencode = true)
        (System.nanoTime() - t1) / 1e9
      }

      val identical = skipReencode || chunkHashes(outA) == chunkHashes(outB)
      val bytesIn = spark.read.parquet(EncodeJob.lineagePath(outA))
        .agg(org.apache.spark.sql.functions.sum("bytes_in")).first().getLong(0)
      val gb = bytesIn / 1e9
      println(f"COMPACT_AB reuse_sec=$reuseSec%.2f (${gb / reuseSec}%.3f GB/s) " +
        f"reencode_sec=$reencSec%.2f (${gb / reencSec}%.3f GB/s) " +
        f"speedup=${reencSec / reuseSec}%.2fx identical_chunks=$identical")
      // spot decode gate
      val n = DecodeJob.run(spark, outA).count()
      println(s"COMPACT_AB decoded_rows=$n expected=$nPages")
      // record the failure but exit AFTER the finally (sys.exit here would
      // skip it and leak the multi-GB /dev/shm tables into later runs)
      if (!identical || n != nPages) {
        System.err.println("COMPACT_AB GATE FAILED")
        failed = true
      }
    } finally {
      Bench.deleteDir(base)
      spark.stop()
    }
    if (failed) sys.exit(1)
  }
}
