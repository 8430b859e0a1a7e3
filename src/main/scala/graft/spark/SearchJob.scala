package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

import graft.codec.FmIndex

/** Distributed FM-index pattern search over a document collection.
  *
  * The reference parallelizes over the *pattern list* inside one process
  * (parListChunk, /root/reference/src/Data/FMIndex.hs:417-423); at cluster
  * scale the right axis is the *document* axis: patterns are tiny (a
  * broadcast list), documents are the 100 TB side, so each task builds the
  * FM-index for its local documents once and runs every pattern against it
  * — no shuffle at all, pure narrow map (the Spark analogue of the
  * reference's shared-read-only-index, data-parallel search).
  */
final case class SearchHit(
    doc_key: String,
    pattern: String,
    cnt: Long,
    first_pos: Option[Long], // min 1-based byte position, None if absent
    positions_unsorted: Seq[Long] // row-ordered, as the reference returns them
)

object SearchJob {

  /** Search with index reuse: if `indexDir` holds an [[IndexJob]] table it
    * is searched directly (no SA-IS, no touch of `docs`); otherwise the
    * index is built there first, so the SECOND and every later invocation
    * pays zero suffix-array construction. A pipeline that searches the
    * same corpus repeatedly should use this entry point — the one-shot
    * [[run]] rebuilds the per-doc FM-index on every call by design.
    */
  def runWithIndex(
      spark: SparkSession,
      docs: Dataset[(String, String)],
      patterns: Seq[String],
      indexDir: String,
      compat: Boolean = false,
      saSampleBits: Int = 5
  ): Dataset[SearchHit] = {
    if (!indexExists(spark, indexDir))
      IndexJob.build(spark, docs, indexDir, saSampleBits)
    IndexJob.search(spark, indexDir, patterns, compat)
  }

  private def indexExists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** One-shot search: builds each document's FM-index inside the task and
    * discards it. Correct for single-pass scans; for repeated searches use
    * [[runWithIndex]] (this form pays SA-IS per invocation).
    */
  def run(
      spark: SparkSession,
      docs: Dataset[(String, String)], // (key, text)
      patterns: Seq[String],
      compat: Boolean = false
  ): Dataset[SearchHit] = {
    import spark.implicits._
    val bcPatterns = spark.sparkContext.broadcast(patterns.map(p => (p, p.getBytes(UTF_8))))
    // parallelism floor (guide §2): per-doc SA-IS on a one-split input
    // would otherwise run on a single core; corpus-scale scans untouched
    graft.pipeline.Dedup.spread(docs).mapPartitions { it =>
      val pats = bcPatterns.value
      it.flatMap { case (key, text) =>
        val fm = FmIndex.build(text.getBytes(UTF_8))
        pats.iterator.map { case (p, pb) =>
          val positions = fm.locate(pb, compat)
          SearchHit(
            key,
            p,
            fm.count(pb, compat).getOrElse(0).toLong,
            if (positions.isEmpty) None else Some(positions.min.toLong),
            positions.map(_.toLong).toSeq
          )
        }
      }
    }
  }
}
