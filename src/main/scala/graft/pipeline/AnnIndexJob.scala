package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/search-many ANN index tables — the embedding-side analogue of
  * the FM-index's persisted form (the reference embeds the suffix array in
  * the serialized index precisely so repeated searches never re-derive it,
  * /root/reference/CHANGELOG.md:104-106). [[Similarity.ivfTopK]] and
  * [[Similarity.lshTopK]] recompute the corpus-side structure (centroid
  * assignment / band signatures) on every query batch; these jobs pay that
  * pass once at build time and store it as parquet, so a search touches
  * only the stored index:
  *
  *  - IVF: assignments are written `partitionBy(list_id)`, so a probe of
  *    p of L lists is a *partition-pruned* scan reading ~p/L of the index —
  *    at 100 TB the unprobed lists are never opened at all.
  *  - RHP-LSH: banded rows are written `partitionBy(band)` and sorted by
  *    bucket within each file, so the enumerated probe buckets (all bucket
  *    values within `multiProbe` bit flips — Σ C(bits, 0..multiProbe) per
  *    band per query) push down as an `isin` filter to parquet row-group
  *    stats. Candidate generation costs the matched buckets, not a corpus
  *    scan, and each row stores its full signature so the
  *    first-matching-band gate dedups (query, candidate) pairs without any
  *    `distinct` exchange — the search plan is one narrow pruned scan plus
  *    the O(queries * partitions * k) heap merge.
  *
  * Both searches degenerate to exact brute force at full probe
  * (nProbe = nLists / multiProbe = bitsPerBand), which is how the stored
  * machinery is DuckDB-oracle-checked end to end (q38/q39).
  */
object AnnIndexJob {

  final case class IvfCentroid(list_id: Int, vec: Array[Float])
  final case class IvfRow(id: Long, vec: Array[Float], list_id: Int)
  final case class RhpRow(band: Int, bucket: Long, id: Long, sig: Long, vec: Array[Float])
  final case class RhpMeta(bands: Int, bitsPerBand: Int, seed: Long)

  final val RhpSeed = Similarity.RhpSeed

  private def ivfCentroidsPath(dir: String) = s"$dir/ivf_centroids"
  private def ivfAssignPath(dir: String) = s"$dir/ivf_assign"
  private def ivfLookupPath(dir: String) = s"$dir/ivf_lookup"
  private def rhpMetaPath(dir: String) = s"$dir/rhp_meta"
  private def rhpRowsPath(dir: String) = s"$dir/rhp_rows"
  private def rhpLookupPath(dir: String) = s"$dir/rhp_lookup"

  /** Write an id-keyed lookup table: range-partitioned and sorted by id, so
    * fetching a handful of query vectors is an `id isin (...)` filter that
    * prunes to the few row groups whose min/max id stats cover the probes —
    * NOT a scan of the (list_id- or band-partitioned) index body, whose
    * layout serves the candidate probe and carries no id locality.
    */
  private def writeIdLookup(df: DataFrame, path: String): Unit =
    df.repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Deterministic coarse quantizer shared with [[Similarity.ivfTopK]]:
    * the nLists corpus vectors with the lowest xxhash64(id) ranks.
    */
  private def pickCentroids(
      vectors: Dataset[(Long, Array[Float])],
      nLists: Int
  ): Array[Array[Float]] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.toDF("id", "vec")
      .withColumn("r", xxhash64(col("id")))
      .orderBy(col("r"), col("id"))
      .limit(nLists)
      .select($"vec").as[Array[Float]]
      .collect()
  }

  /** Nearest-centroid assignment with the same tie-break as ivfTopK's
    * per-row pass (strict >, so ties keep the lowest list index).
    */
  private def assignList(cents: Array[Array[Float]], vec: Array[Float]): Int = {
    var best = 0
    var bestCos = -2.0
    var c = 0
    while (c < cents.length) {
      val cc = Similarity.cosine(cents(c), vec)
      if (cc > bestCos) { bestCos = cc; best = c }
      c += 1
    }
    best
  }

  /** One corpus pass: pick centroids, assign every vector, write
    * centroids + `partitionBy(list_id)` assignments.
    */
  def buildIvf(
      spark: SparkSession,
      vectors: Dataset[(Long, Array[Float])],
      outDir: String,
      nLists: Int = 64
  ): Unit = {
    import spark.implicits._
    val cents = pickCentroids(vectors, nLists)
    spark.createDataset(cents.zipWithIndex.map { case (v, i) => IvfCentroid(i, v) }.toIndexedSeq)
      .write.mode(SaveMode.Overwrite).parquet(ivfCentroidsPath(outDir))
    val bc = spark.sparkContext.broadcast(cents)
    vectors.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, vec) => IvfRow(id, vec, assignList(cs, vec)) }
    }.write.mode(SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(ivfAssignPath(outDir))
    // lookup derives from the just-written index (a local re-read), not a
    // second pass over `vectors` — which may be an expensive lazy pipeline
    writeIdLookup(
      spark.read.parquet(ivfAssignPath(outDir)).select($"id", $"vec"),
      ivfLookupPath(outDir))
  }

  /** Top-k cosine search against a stored IVF index. No assignment pass:
    * the only corpus-sized work is the partition-pruned scan of the probed
    * lists. Result schema/order matches [[Similarity.ivfTopK]] exactly.
    */
  def searchIvf(
      spark: SparkSession,
      indexDir: String,
      queryIds: Seq[Long],
      k: Int,
      nProbe: Int
  ): DataFrame = {
    import spark.implicits._
    val cents: Array[Array[Float]] = spark.read.parquet(ivfCentroidsPath(indexDir))
      .as[IvfCentroid].collect().sortBy(_.list_id).map(_.vec)
    val assign = spark.read.parquet(ivfAssignPath(indexDir))
    // row-group-pruned fetch from the id-sorted lookup — does not open the
    // list-partitioned index body at all. Indexes persisted before the
    // lookup table existed fall back to the (unpruned) body scan.
    val querySrc =
      if (pathExists(spark, ivfLookupPath(indexDir))) spark.read.parquet(ivfLookupPath(indexDir))
      else assign
    val queries: Array[(Long, Array[Float])] = querySrc
      .filter(col("id").isin(queryIds: _*))
      .select($"id", $"vec").as[(Long, Array[Float])].collect()

    def nearestLists(v: Array[Float], np: Int): Array[Int] =
      cents.indices
        .map(c => (c, Similarity.cosine(cents(c), v)))
        .sortBy { case (c, cos) => (-cos, c) }
        .take(np).map(_._1).toArray

    val qProbes = queries.map { case (qid, qv) => (qid, qv, nearestLists(qv, nProbe).toSet) }
    val probed = qProbes.flatMap(_._3).distinct.map(_.toLong)
    val bcQ = spark.sparkContext.broadcast(qProbes)

    // list_id is the partition column: this filter prunes unprobed lists
    // out of the scan entirely (directories never opened)
    val partial = assign
      .filter(col("list_id").isin(probed: _*))
      .select($"id", $"vec", $"list_id").as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val qs = bcQ.value
        val heaps = qs.map { case (qid, _, _) =>
          qid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](Similarity.worstFirst)
        }
        it.foreach { case (id, vec, list) =>
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, probes) = qs(qi)
            if (qid != id && probes.contains(list))
              Similarity.pushBounded(heaps(qi)._2, (Similarity.cosine(qv, vec), id), k)
            qi += 1
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (cos, nbr) => (qid, nbr, cos) }
        }
      }
    Similarity.mergeTopK(spark, partial, k).select($"query_id", $"nbr_id", $"rank", $"cos")
  }

  /** One corpus pass: signature per vector, bands exploded, written
    * `partitionBy(band)` sorted by bucket (row-group stats prune bucket
    * `isin` probes). Rows are duplicated bands-fold — inherent to a banded
    * LSH index, paid once here instead of per query batch.
    */
  def buildRhp(
      spark: SparkSession,
      vectors: Dataset[(Long, Array[Float])],
      outDir: String,
      bands: Int = 4,
      bitsPerBand: Int = 8
  ): Unit = {
    import spark.implicits._
    require(bands * bitsPerBand <= 64, "signature must fit one Long")
    spark.createDataset(Seq(RhpMeta(bands, bitsPerBand, RhpSeed)))
      .write.mode(SaveMode.Overwrite).parquet(rhpMetaPath(outDir))
    vectors.flatMap { case (id, vec) =>
      val sig = Similarity.rhpSignature(vec, bands * bitsPerBand, RhpSeed)
      (0 until bands).iterator.map { b =>
        RhpRow(b, (sig >>> (b * bitsPerBand)) & ((1L << bitsPerBand) - 1), id, sig, vec)
      }
    }.repartitionByRange(col("band"), col("bucket")) // parallel writers per band,
      .sortWithinPartitions(col("band"), col("bucket")) // files cover narrow bucket ranges
      .write.mode(SaveMode.Overwrite)
      .partitionBy("band")
      .parquet(rhpRowsPath(outDir))
    // lookup derives from the just-written band-0 rows (each id appears
    // once per band with its full signature) — no second corpus pass, no
    // signature recompute
    writeIdLookup(
      spark.read.parquet(rhpRowsPath(outDir))
        .filter(col("band") === 0).select($"id", $"vec", $"sig"),
      rhpLookupPath(outDir))
  }

  /** All bucket values within `maxFlips` bit flips of `base` —
    * Σ C(bits, 0..maxFlips) values, enumerable because multiProbe is small.
    */
  private[pipeline] def probeBuckets(base: Long, bits: Int, maxFlips: Int): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long](base)
    def rec(value: Long, fromBit: Int, flipsLeft: Int): Unit = {
      if (flipsLeft > 0) {
        var b = fromBit
        while (b < bits) {
          val v = value ^ (1L << b)
          out += v
          rec(v, b + 1, flipsLeft - 1)
          b += 1
        }
      }
    }
    rec(base, 0, maxFlips)
    out.toArray
  }

  /** Top-k cosine search against a stored RHP-LSH index. Candidate
    * generation is the pruned `(band, bucket isin probes)` scan — cost
    * proportional to the matched buckets, not the corpus. The stored full
    * signature lets each row determine its first band matching the query,
    * so a (query, candidate) pair is scored exactly once with no
    * `distinct` exchange. multiProbe = bitsPerBand degenerates to exact
    * brute force (every bucket of band 0 probed).
    */
  def searchRhp(
      spark: SparkSession,
      indexDir: String,
      queryIds: Seq[Long],
      k: Int,
      multiProbe: Int = 1
  ): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(rhpMetaPath(indexDir)).as[RhpMeta].head()
    require(meta.seed == RhpSeed,
      s"stored RHP index used seed ${meta.seed}; this build's hyperplane family uses $RhpSeed")
    val bands = meta.bands
    val bits = meta.bitsPerBand
    val mp = math.min(multiProbe, bits)
    val mask = (1L << bits) - 1
    val rows = spark.read.parquet(rhpRowsPath(indexDir))
    // row-group-pruned fetch from the id-sorted lookup — the band-partitioned
    // index body has bucket locality, not id locality. Pre-lookup indexes
    // fall back to the band-0 body scan.
    val querySrc =
      if (pathExists(spark, rhpLookupPath(indexDir))) spark.read.parquet(rhpLookupPath(indexDir))
      else rows.filter(col("band") === 0)
    val queries: Array[(Long, Array[Float], Long)] = querySrc
      .filter(col("id").isin(queryIds: _*))
      .select($"id", $"vec", $"sig").as[(Long, Array[Float], Long)].collect()

    // per band: union of every query's probe buckets (pushdown filter)
    val perBand: Array[Array[Long]] = Array.tabulate(bands) { b =>
      queries.flatMap { case (_, _, qsig) =>
        probeBuckets((qsig >>> (b * bits)) & mask, bits, mp)
      }.distinct
    }
    val pruned = (0 until bands).map { b =>
      rows.filter(col("band") === b && col("bucket").isin(perBand(b).toIndexedSeq: _*))
    }.reduce(_ union _)

    val bcQ = spark.sparkContext.broadcast(queries)
    val partial = pruned
      .select($"id", $"sig", $"vec", $"band").as[(Long, Long, Array[Float], Int)]
      .mapPartitions { it =>
        val qs = bcQ.value
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        @inline def firstMatchingBand(qsig: Long, sig: Long): Int = {
          var b = 0
          while (b < bands) {
            if (java.lang.Long.bitCount(((qsig ^ sig) >>> (b * bits)) & mask) <= mp) return b
            b += 1
          }
          -1
        }
        it.foreach { case (id, sig, vec, band) =>
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qsig) = qs(qi)
            if (qid != id && firstMatchingBand(qsig, sig) == band) {
              val h = heaps.getOrElseUpdate(qid,
                scala.collection.mutable.PriorityQueue.empty[(Double, Long)](Similarity.worstFirst))
              Similarity.pushBounded(h, (Similarity.cosine(qv, vec), id), k)
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (cos, nbr) => (qid, nbr, cos) }
        }
      }
    Similarity.mergeTopK(spark, partial, k).select($"query_id", $"nbr_id", $"rank", $"cos")
  }
}
