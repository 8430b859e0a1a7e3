package graft.tools

/** Measures the single-thread cosine-evaluation rate backing
  * `Similarity.ExactTierMaxVectors` (the exact near-dup tier's require
  * cap): pair evaluations/second on dim-16 float vectors, the
  * configuration the documents/embeddings pipeline uses.
  *
  *   sbt -batch "runMain graft.tools.CosineRateProbe"
  */
object CosineRateProbe {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 16
    val n = 4000
    val rnd = new scala.util.Random(42)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    var sink = 0.0
    def pass(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          sink += graft.pipeline.Similarity.cosine(vecs(i), vecs(j))
          j += 1
        }
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      n.toLong * (n - 1) / 2 / sec
    }
    pass(); pass() // JIT warmup
    val rates = (1 to 3).map(_ => pass())
    println(f"COSINE_RATE dim=$dim evals_per_sec_per_core=${rates.max}%.3e (sink=$sink%.1f)")
    val rate = rates.max
    val cap = graft.pipeline.Similarity.ExactTierMaxVectors
    val pairEvals = cap.toDouble * cap / 2
    println(f"COSINE_RATE exact-tier cap $cap vectors = ${pairEvals}%.2e pair evals" +
      f" = ${pairEvals / rate / 32 / 60}%.1f min on 32 cores")
  }
}
