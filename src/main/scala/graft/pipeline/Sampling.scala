package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic sampling for training-mixture construction. */
object Sampling {

  /** Per-stratum Bernoulli sampling by a pure row function: a row with
    * key `k` in stratum `s` (rate num/den) survives iff
    * `(splitmix64(k + salt) & Long.MaxValue) % den < num`.
    *
    * Properties a mixture pipeline needs and `df.sample()` cannot give:
    * deterministic (same corpus -> same sample at any cluster size or
    * partitioning — no RNG/seed-per-partition state), resumable (a re-run
    * over a delta keeps exactly the rows the full run would), exact
    * integers end-to-end (a SQL oracle reproduces the kept set
    * row-for-row), and per-stratum rates in one pass (the lang/source
    * mixing knob, e.g. keep 1/2 of `en`, 1/4 of everything else).
    *
    * Returns kept rows only: (doc_id, stratum, u) with `u` the sampled
    * residue (`u < num` by construction — exposed so downstream multi-rate
    * splits can reuse the same draw).
    *
    * 100 TB shape: ONE narrow mapPartitions filter — no shuffle, no
    * driver state; composes with scan pushdown since it consumes only the
    * key and stratum columns.
    */
  def stratifiedSample(
      spark: SparkSession,
      rows: Dataset[(Long, String)],
      rates: Map[String, (Int, Int)],
      defaultRate: (Int, Int) = (1, 1),
      salt: Long = 0L
  ): DataFrame = {
    import spark.implicits._
    (rates.values.toSeq :+ defaultRate).foreach { case (num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"rate must be 0<=num<=den, got $num/$den")
    }
    rows.mapPartitions { it =>
      it.flatMap { case (id, stratum) =>
        val (num, den) = rates.getOrElse(stratum, defaultRate)
        val u = (Dedup.mix(id + salt) & Long.MaxValue) % den
        if (u < num) Iterator.single((id, stratum, u)) else Iterator.empty
      }
    }.toDF("doc_id", "stratum", "u")
  }
}
