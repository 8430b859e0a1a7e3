package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query set,
  * one narrow pass over the corpus computing cosine, then a per-query
  * window for top-k — the only shuffle is on query_id, whose cardinality
  * is the query count, not the corpus size.
  *
  * `lshTopK` is the scale path: random-hyperplane signatures bucket the
  * corpus; each query only scores its own buckets (multi-probe = exact
  * band match on any of the bands). Recall is tunable by bands/bits.
  */
object Similarity {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Exact top-k cosine neighbors for each query id. */
  def bruteForceTopK(
      spark: SparkSession,
      vectors: Dataset[(Long, Array[Float])],
      queryIds: Seq[Long],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val queries = vectors.filter(v => queryIds.contains(v._1)).collect()
    val bc = spark.sparkContext.broadcast(queries)
    val scored = vectors.mapPartitions { it =>
      val qs = bc.value
      it.flatMap { case (id, vec) =>
        qs.iterator.collect {
          case (qid, qvec) if qid != id => (qid, id, cosine(qvec, vec))
        }
      }
    }.toDF("query_id", "nbr_id", "cos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id")
      .orderBy($"cos".desc, $"nbr_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"nbr_id", $"rank")
  }

  /** Random-hyperplane signature: `bits` sign bits from deterministic
    * pseudo-random hyperplanes (hash-derived, no stored planes).
    */
  def rhpSignature(vec: Array[Float], bits: Int, seed: Long): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) {
        // deterministic pseudo-gaussian-ish weight in [-1, 1)
        val h = mix(seed ^ (b.toLong << 32) ^ i)
        dot += vec(i) * ((h >> 11).toDouble / (1L << 52).toDouble)
        i += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Bucketed ANN: candidates share at least one signature band with the
    * query; exact cosine + top-k within candidates.
    */
  def lshTopK(
      spark: SparkSession,
      vectors: Dataset[(Long, Array[Float])],
      queryIds: Seq[Long],
      k: Int,
      bands: Int = 4,
      bitsPerBand: Int = 8
  ): DataFrame = {
    import spark.implicits._
    val banded = vectors.flatMap { case (id, vec) =>
      val sig = rhpSignature(vec, bands * bitsPerBand, 0xC0FFEEL)
      (0 until bands).iterator.map { b =>
        (b, (sig >>> (b * bitsPerBand)) & ((1L << bitsPerBand) - 1), id)
      }
    }.toDF("band", "bucket", "id")

    val queries = vectors.filter(v => queryIds.contains(v._1)).collect()
    val bc = spark.sparkContext.broadcast(queries.map { case (id, v) =>
      (id, v, rhpSignature(v, bands * bitsPerBand, 0xC0FFEEL))
    })
    val vecById = vectors.toDF("id", "vec")

    val cands = banded.as[(Int, Long, Long)].mapPartitions { it =>
      val qs = bc.value
      it.flatMap { case (band, bucket, id) =>
        qs.iterator.collect {
          case (qid, _, qsig)
              if qid != id &&
                ((qsig >>> (band * bitsPerBand)) & ((1L << bitsPerBand) - 1)) == bucket =>
            (qid, id)
        }
      }
    }.toDF("query_id", "nbr_id").distinct()

    val scored = cands
      .join(vecById.withColumnRenamed("id", "nbr_id"), "nbr_id")
      .as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bc.value.map(q => q._1 -> q._2).toMap
        it.map { case (nbr, qid, vec) => (qid, nbr, cosine(qs(qid), vec)) }
      }
      .toDF("query_id", "nbr_id", "cos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id")
      .orderBy($"cos".desc, $"nbr_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"nbr_id", $"rank", $"cos")
  }
}
