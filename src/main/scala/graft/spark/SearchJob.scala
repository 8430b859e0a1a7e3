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

  def run(
      spark: SparkSession,
      docs: Dataset[(String, String)], // (key, text)
      patterns: Seq[String],
      compat: Boolean = false
  ): Dataset[SearchHit] = {
    import spark.implicits._
    val bcPatterns = spark.sparkContext.broadcast(patterns.map(p => (p, p.getBytes(UTF_8))))
    docs.mapPartitions { it =>
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
