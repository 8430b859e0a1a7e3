package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.TestSpark

/** Stored ANN index tables: the searches must agree with their in-memory
  * operators exactly (same candidates, same tie-breaks) at BOTH the exact
  * (full-probe) degeneration and the approximate regimes — the stored form
  * is a cost optimization, never a semantics change.
  */
class AnnIndexJobSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"annidx_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def clusteredVecs(seed: Int, clusters: Int, per: Int, dim: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until clusters).flatMap { c =>
      val centroid = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      (0 until per).map { m =>
        ((c * per + m).toLong, centroid.map(x => x + (rnd.nextFloat() * 2 - 1) * 0.1f))
      }
    }
  }

  private def ranked(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Long] =
    df.collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap

  test("probeBuckets enumerates exactly the hamming ball") {
    val got = AnnIndexJob.probeBuckets(0xA5L, bits = 8, maxFlips = 2)
    assert(got.length == got.distinct.length, "duplicates")
    assert(got.length == 1 + 8 + 28) // C(8,0)+C(8,1)+C(8,2)
    assert(got.forall(v => java.lang.Long.bitCount(v ^ 0xA5L) <= 2))
    assert(got.forall(v => v >= 0 && v < 256))
    val all = AnnIndexJob.probeBuckets(0x3CL, bits = 6, maxFlips = 6)
    assert(all.sorted.toSeq == (0L until 64L)) // full ball = whole space
  }

  test("stored IVF search equals in-memory ivfTopK at partial AND full probe") {
    import spark.implicits._
    val vecs = clusteredVecs(seed = 23, clusters = 12, per = 10, dim = 12)
    val ds = spark.createDataset(vecs).repartition(4)
    val dir = tmp("ivf")
    AnnIndexJob.buildIvf(spark, ds, dir, nLists = 12)
    val queryIds = Seq(0L, 37L, 101L)
    for (nProbe <- Seq(3, 12)) {
      val stored = ranked(AnnIndexJob.searchIvf(spark, dir, queryIds, k = 6, nProbe = nProbe))
      val memory = ranked(Similarity.ivfTopK(spark, ds, queryIds, k = 6, nLists = 12, nProbe = nProbe))
      assert(stored == memory, s"nProbe=$nProbe")
    }
    // full probe must also equal exact brute force, rank for rank
    val exact = ranked(Similarity.bruteForceTopK(spark, ds, queryIds, 6))
    val full = ranked(AnnIndexJob.searchIvf(spark, dir, queryIds, k = 6, nProbe = 12))
    assert(full == exact)
  }

  test("stored RHP search equals in-memory lshTopK; full probe equals brute force") {
    import spark.implicits._
    val vecs = clusteredVecs(seed = 29, clusters = 16, per = 8, dim = 16)
    val ds = spark.createDataset(vecs).repartition(4)
    val dir = tmp("rhp")
    AnnIndexJob.buildRhp(spark, ds, dir, bands = 4, bitsPerBand = 8)
    val queryIds = Seq(0L, 8L, 64L, 120L)
    // identical candidate semantics (band hamming <= multiProbe) => identical top-k
    for (mp <- Seq(0, 1)) {
      val stored = ranked(AnnIndexJob.searchRhp(spark, dir, queryIds, k = 5, multiProbe = mp))
      val memory = ranked(Similarity.lshTopK(spark, ds, queryIds, k = 5,
        bands = 4, bitsPerBand = 8, multiProbe = mp))
      assert(stored == memory, s"multiProbe=$mp")
    }
    val exact = ranked(Similarity.bruteForceTopK(spark, ds, queryIds, 5))
    val full = ranked(AnnIndexJob.searchRhp(spark, dir, queryIds, k = 5, multiProbe = 8))
    assert(full == exact)
  }
}
