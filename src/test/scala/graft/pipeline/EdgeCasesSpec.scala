package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.TestSpark

/** Degenerate-input behavior of the pipeline operators: empty corpora,
  * empty/absent query ids, single-element inputs. Each must return an
  * empty (correctly-schemaed) result or a sensible singleton — never
  * throw on shapes a real 10^12-row pipeline inevitably produces at the
  * edges (empty partitions, filtered-away query batches).
  */
class EdgeCasesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int = 8) = {
    val rnd = new scala.util.Random(7)
    spark.createDataset((0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat()))))
  }

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"edge_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("ANN searches with empty or absent query ids return empty results") {
    val ds = vecs(50)
    assert(Similarity.bruteForceTopK(spark, ds, Seq.empty, 5).count() == 0)
    assert(Similarity.bruteForceTopK(spark, ds, Seq(9999L), 5).count() == 0)
    assert(Similarity.lshTopK(spark, ds, Seq.empty, 5).count() == 0)
    assert(Similarity.ivfTopK(spark, ds, Seq(12345L), 5, nLists = 8, nProbe = 2).count() == 0)

    val ivfDir = tmp("ivf")
    AnnIndexJob.buildIvf(spark, ds, ivfDir, nLists = 8)
    assert(AnnIndexJob.searchIvf(spark, ivfDir, Seq.empty, 5, nProbe = 2).count() == 0)
    assert(AnnIndexJob.searchIvf(spark, ivfDir, Seq(777L), 5, nProbe = 2).count() == 0)
    val rhpDir = tmp("rhp")
    AnnIndexJob.buildRhp(spark, ds, rhpDir, bands = 4, bitsPerBand = 4)
    assert(AnnIndexJob.searchRhp(spark, rhpDir, Seq.empty, 5).count() == 0)
    assert(AnnIndexJob.searchRhp(spark, rhpDir, Seq(777L), 5).count() == 0)
  }

  test("dedup operators on empty and singleton corpora") {
    val empty = spark.createDataset(Seq.empty[(Long, String)])
    assert(Dedup.minHashPairs(spark, empty).count() == 0)
    assert(Dedup.simHashPairs(spark, empty).count() == 0)
    val one = spark.createDataset(Seq((1L, "a single document")))
    assert(Dedup.minHashPairs(spark, one).count() == 0)
    assert(Dedup.simHashPairs(spark, one).count() == 0)
  }

  test("embedding near-dup on empty and tiny corpora") {
    val empty = spark.createDataset(Seq.empty[(Long, Array[Float])])
    assert(Similarity.embeddingNearDup(spark, empty, 0.9).count() == 0)
    assert(Similarity.embeddingNearDupLsh(spark, empty, 0.9).count() == 0)
    val two = vecs(2)
    // 2 identical-dim random vectors: result is 0 or 1 pairs, never a throw
    assert(Similarity.embeddingNearDup(spark, two, -1.0).count() == 1) // cos >= -1 always
  }
}
