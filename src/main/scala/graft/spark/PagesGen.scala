package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** One row of the north-rule pages table (BASELINE.json `input_hint`):
  * `(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)`.
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Deterministic Common-Crawl-style pages synthesizer (FIXTURES.md §1).
  *
  * Pure function of (seed, docId) via SplitMix64 — identical bytes on any
  * JVM, any partitioning, any parallelism, which is what makes the
  * bit-identical roundtrip gate and the N-vs-4N scaling runs comparable.
  * Generated distributed via `spark.range(n)` (narrow, no shuffle, scales
  * to any row count the cluster can hold).
  *
  * `hostSkew = true` puts 80% of docs on 5% of hosts — the skewed url-host
  * distribution the north rule's salting requirement targets.
  */
object PagesGen {

  private val Langs = Array("en", "fr", "es", "zh", "de")
  // cumulative weights for {en:40, fr:15, es:15, zh:15, de:15}
  private val LangCum = Array(40, 55, 70, 85, 100)

  private val VocabByLang: Map[String, Array[String]] = Map(
    "en" -> "the of and to in is was for on that with said his they page web data new time".split(' '),
    "fr" -> "le la de et les des en un une du est pour que dans qui par sur page donnée".split(' '),
    "es" -> "el la de que y en los del las un por con una para es datos página tiempo".split(' '),
    "zh" -> "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他".split(' '),
    "de" -> "der die und in den von zu das mit sich des auf für ist im seite daten neue".split(' ')
  )
  private val Shared = "alpha beta gamma delta omega server cloud index 2022 http href table".split(' ')

  final val Epoch = java.time.Instant.parse("2022-10-31T00:00:00Z")

  /** SplitMix64 step (public-domain PRNG, Steele et al. 2014). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic row for (seed, docId). */
  def page(seed: Long, docId: Long, numHosts: Int, hostSkew: Boolean): Page = {
    var state = mix(seed ^ mix(docId))
    @inline def next(): Long = { state = mix(state); state }
    @inline def nextInt(bound: Int): Int = (((next() >>> 1) % bound).toInt)

    val langRoll = nextInt(100)
    var li = 0
    while (LangCum(li) <= langRoll) li += 1
    val lang = Langs(li)

    val host =
      if (hostSkew && nextInt(100) < 80) nextInt(math.max(numHosts / 20, 1))
      else nextInt(numHosts)

    val vocab = VocabByLang(lang)
    val nTokens = 50 + nextInt(1951) // 50..2000
    val sb = new java.lang.StringBuilder(nTokens * 6)
    var i = 0
    while (i < nTokens) {
      if (i > 0) sb.append(' ')
      if (nextInt(10) < 8) sb.append(vocab(nextInt(vocab.length)))
      else sb.append(Shared(nextInt(Shared.length)))
      i += 1
    }
    val text = sb.toString

    val url = s"https://host$host.example/p/${java.lang.Long.toHexString(mix(docId))}/$docId"
    val html =
      (s"<html><head><title>doc $docId</title></head><body><p>" + text + "</p></body></html>")
        .getBytes(UTF_8)
    val ts = java.sql.Timestamp.from(Epoch.plusSeconds(docId))
    Page(url, ts, html, text, lang)
  }

  /** Distributed generation: narrow map over spark.range — no shuffle. */
  def generate(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      numHosts: Int = 100,
      hostSkew: Boolean = false,
      partitions: Int = 32
  ): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(id => page(seed, id, numHosts, hostSkew))
  }
}
