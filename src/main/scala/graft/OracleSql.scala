package graft

/** DuckDB oracle SQL for the two hash-pipeline queries whose semantics
  * are deterministic but arithmetic-heavy: the SQL re-implements the
  * engine's exact kernels — java String.hashCode (31-polynomial mod 2^32,
  * sign-extended), splitmix64 (division-free 64-bit mul-mod via 32-bit
  * limb splitting in UBIGINT/HUGEINT), the affine (a*x+b) minhash family
  * with SIGNED 64-bit min, 16x4 banded buckets with the 2..64 bucket-size
  * cap, and simhash bit votes — so DuckDB independently recomputes the
  * full pipeline from the documents table. Both validated token-for-token
  * against the engine at sf0.01 (q20: 522 pairs, q21: 1141 pairs).
  *
  * Maintenance note: any change to Dedup.mix/minHashSignature/simHash or
  * the band layout must be mirrored here (the correctness gate will catch
  * a drift as a hash mismatch).
  */
object OracleSql {

  /** splitmix64 finalizer steps as DuckDB UBIGINT/HUGEINT limb arithmetic
    * (shared shape with the m1-m3 chain in the q21 oracle).
    */
  private def mulMod(shift: Int, c: String): String =
    s"CAST(((((CAST(xor(z, z >> $shift) AS HUGEINT)) % 4294967296) * $c) % 18446744073709551616" +
      s" + ((((CAST(xor(z, z >> $shift) AS HUGEINT)) // 4294967296) * $c) % 4294967296) * 4294967296)" +
      s" % 18446744073709551616 AS UBIGINT)"

  /** SQL twin of `Dedup.cappedBucketPairs` over a (doc_id, b, bk) bucket
    * CTE: buckets <= maxBucket pair directly; oversized buckets are
    * salt-split into ceil(n/maxBucket) sub-buckets with
    * salt = (splitmix64(doc_id + b + 1) & Long.MaxValue) % s, and
    * sub-buckets beyond 2x maxBucket are dropped. Emits CTEs ending in
    * `cand (id_a, id_b)`; splice after the bucket CTE (leading comma NOT
    * included).
    */
  private def cappedCandidatesSql(bucket: String, maxBucket: Int): String = {
    val mb = maxBucket
    s"""bsize AS (SELECT b, bk, COUNT(*) AS n FROM $bucket GROUP BY b, bk),
keepc AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b
  FROM $bucket x
  JOIN $bucket y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id
  JOIN bsize s ON s.b = x.b AND s.bk = x.bk
  WHERE s.n BETWEEN 2 AND $mb
),
over_b AS (SELECT b, bk, (n + ${mb - 1}) // $mb AS s FROM bsize WHERE n > $mb),
sa0 AS (
  SELECT x.doc_id, x.b, x.bk, o.s,
    CAST((CAST(CAST(x.doc_id + x.b + 1 AS UBIGINT) AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
  FROM $bucket x JOIN over_b o ON o.b = x.b AND o.bk = x.bk
),
sa1 AS (SELECT doc_id, b, bk, s, ${mulMod(30, "13787848793156543929")} AS z FROM sa0),
sa2 AS (SELECT doc_id, b, bk, s, ${mulMod(27, "10723151780598845931")} AS z FROM sa1),
salts AS MATERIALIZED (
  SELECT doc_id, b, bk,
    CAST((xor(z, z >> 31) & CAST(9223372036854775807 AS UBIGINT)) % CAST(s AS UBIGINT) AS BIGINT) AS salt
  FROM sa2
),
subsize AS (SELECT b, bk, salt, COUNT(*) AS n FROM salts GROUP BY b, bk, salt),
splitc AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b
  FROM salts x
  JOIN salts y ON x.b = y.b AND x.bk = y.bk AND x.salt = y.salt AND x.doc_id < y.doc_id
  JOIN subsize s2 ON s2.b = x.b AND s2.bk = x.bk AND s2.salt = x.salt
  WHERE s2.n BETWEEN 2 AND ${2 * mb}
),
cand AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT id_a, id_b FROM keepc UNION ALL SELECT id_a, id_b FROM splitc)
)"""
  }

  val q20MinhashPairs: String = """WITH codes AS (
  SELECT doc_id, [unicode(c) FOR c IN string_split_regex(text, '')] AS cs, length(text) AS n
  FROM documents
),
pos AS (SELECT doc_id, cs, unnest(range(n - 4)) AS i FROM codes WHERE n >= 5),
sh0 AS (
  SELECT doc_id, cs, i,
    CAST((CAST(xor(CAST(74565 AS UBIGINT), CAST(cs[i + 1] AS UBIGINT)) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM pos
),
shs0 AS (SELECT doc_id, cs, i, z2 AS z FROM sh0),
sh1 AS (
  SELECT doc_id, cs, i,
    CAST((CAST(xor(z, CAST(cs[i + 2] AS UBIGINT)) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM shs0
),
shs1 AS (SELECT doc_id, cs, i, z2 AS z FROM sh1),
sh2 AS (
  SELECT doc_id, cs, i,
    CAST((CAST(xor(z, CAST(cs[i + 3] AS UBIGINT)) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM shs1
),
shs2 AS (SELECT doc_id, cs, i, z2 AS z FROM sh2),
sh3 AS (
  SELECT doc_id, cs, i,
    CAST((CAST(xor(z, CAST(cs[i + 4] AS UBIGINT)) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM shs2
),
shs3 AS (SELECT doc_id, cs, i, z2 AS z FROM sh3),
sh4 AS (
  SELECT doc_id,
    CAST((CAST(xor(z, CAST(cs[i + 5] AS UBIGINT)) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM shs3
),
shs4 AS (SELECT doc_id, z2 AS z FROM sh4),
shx AS MATERIALIZED (SELECT doc_id, z AS x FROM shs4),
fs AS (SELECT unnest(range(64)) AS f),
pa0 AS (
  SELECT f,
    CAST((CAST(CAST(659918 + f AS UBIGINT) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM fs
),
pav AS (SELECT f, z2 AS az FROM pa0),
pb0 AS (
  SELECT f,
    CAST((CAST(CAST(185322238 + f AS UBIGINT) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM fs
),
pbv AS (SELECT f, z2 AS bz FROM pb0),
abx AS MATERIALIZED (
  SELECT pav.f,
    (pav.az | CAST(1 AS UBIGINT)) & CAST(4294967295 AS UBIGINT) AS al,
    (pav.az | CAST(1 AS UBIGINT)) >> 32 AS ah,
    pbv.bz AS bv
  FROM pav JOIN pbv USING (f)),
sigv AS MATERIALIZED (
  SELECT doc_id, f,
    MIN(CASE WHEN hv >= 9223372036854775808 THEN CAST(hv AS HUGEINT) - 18446744073709551616
             ELSE CAST(hv AS HUGEINT) END) AS sv
  FROM (SELECT s.doc_id, a2.f,
          CAST((CAST(CAST((CAST(((s.x) & 4294967295) * a2.al AS HUGEINT) + (CAST((((((((s.x) & 4294967295) * a2.ah) & 4294967295) + ((((s.x) >> 32) * a2.al) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS HUGEINT) + CAST(a2.bv AS HUGEINT)) & 18446744073709551615 AS UBIGINT) AS hv
        FROM shx s CROSS JOIN abx a2)
  GROUP BY doc_id, f
),
sigu AS (SELECT doc_id, f, CAST(CASE WHEN sv < 0 THEN sv + 18446744073709551616 ELSE sv END AS UBIGINT) AS u FROM sigv),
bandin AS (
  SELECT doc_id, CAST(f // 4 AS INT) AS b,
    MAX(CASE WHEN f % 4 = 0 THEN u END) AS u0,
    MAX(CASE WHEN f % 4 = 1 THEN u END) AS u1,
    MAX(CASE WHEN f % 4 = 2 THEN u END) AS u2,
    MAX(CASE WHEN f % 4 = 3 THEN u END) AS u3
  FROM sigu GROUP BY doc_id, f // 4
),
bk0 AS (
  SELECT doc_id, b, u1, u2, u3,
    CAST((CAST(xor(CAST(45232 + b AS UBIGINT), u0) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM bandin
),
bks0 AS (SELECT doc_id, b, u1, u2, u3, z2 AS z FROM bk0),
bk1 AS (
  SELECT doc_id, b, u2, u3,
    CAST((CAST(xor(z, u1) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM bks0
),
bks1 AS (SELECT doc_id, b, u2, u3, z2 AS z FROM bk1),
bk2 AS (
  SELECT doc_id, b, u3,
    CAST((CAST(xor(z, u2) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM bks1
),
bks2 AS (SELECT doc_id, b, u3, z2 AS z FROM bk2),
bk3 AS (
  SELECT doc_id, b,
    CAST((CAST(xor(z, u3) AS HUGEINT) + 11400714819323198485) & 18446744073709551615 AS UBIGINT) AS mxa,
    CAST((CAST(((xor(mxa, mxa >> 30)) & 4294967295) * 484763065 AS HUGEINT) + (CAST((((((((xor(mxa, mxa >> 30)) & 4294967295) * 3210233709) & 4294967295) + ((((xor(mxa, mxa >> 30)) >> 32) * 484763065) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxb,
    CAST((CAST(((xor(mxb, mxb >> 27)) & 4294967295) * 321982955 AS HUGEINT) + (CAST((((((((xor(mxb, mxb >> 27)) & 4294967295) * 2496678331) & 4294967295) + ((((xor(mxb, mxb >> 27)) >> 32) * 321982955) & 4294967295))) & 4294967295) AS HUGEINT) * 4294967296)) & 18446744073709551615 AS UBIGINT) AS mxc,
    xor(mxc, mxc >> 31) AS z2
  FROM bks2
),
bks3 AS (SELECT doc_id, b, z2 AS z FROM bk3),
bucket AS MATERIALIZED (SELECT doc_id, b, z AS bk FROM bks3),
""" + cappedCandidatesSql("bucket", 64) + """,
est AS (
  SELECT c.id_a, c.id_b,
    SUM(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) / 64.0 AS est_jaccard
  FROM cand c
  JOIN sigv sa ON sa.doc_id = c.id_a
  JOIN sigv sb ON sb.doc_id = c.id_b AND sb.f = sa.f
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.3"""

  /** Per-document simhash value as a signed BIGINT — the q21 pipeline cut
    * before pair formation, for the graft_simhash SQL-surface query.
    */
  def q32SqlSimhash: String = {
    val cut = q21SimhashPairs.lastIndexOf("SELECT a.doc_id AS id_a")
    require(cut > 0, "q21 oracle shape changed; fix the q32 derivation")
    q21SimhashPairs.substring(0, cut) +
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808
        |       THEN CAST(h AS HUGEINT) - 18446744073709551616
        |       ELSE CAST(h AS HUGEINT) END AS BIGINT) AS sh
        |FROM sh""".stripMargin
  }

  val q21SimhashPairs: String = """WITH RECURSIVE maxlen AS (
  SELECT MAX(length(tok)) AS m FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
),
pw31(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (p * 31) % 4294967296 FROM pw31 WHERE k < (SELECT m FROM maxlen)
),
tokcnt AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok
),
vocab AS (SELECT DISTINCT tok FROM tokcnt),
hc AS (
  SELECT tok,
    CAST(SUM(CAST(unicode(substr(tok, CAST(i + 1 AS INT), 1)) AS HUGEINT)
             * (SELECT p FROM pw31 WHERE k = length(tok) - 1 - i)) % 4294967296 AS HUGEINT) AS h32u
  FROM (SELECT tok, unnest(range(length(tok))) AS i FROM vocab)
  GROUP BY tok
),
m0 AS (
  SELECT tok,
    CAST(xor(
      CAST((CASE WHEN h32u >= 2147483648 THEN h32u + 18446744069414584320 ELSE h32u END) AS UBIGINT),
      CAST(1369813885 AS UBIGINT)) AS HUGEINT) AS z
  FROM hc
),
m1 AS (SELECT tok, CAST((z + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM m0),
m2 AS (SELECT tok, CAST(((((CAST(xor(z, z >> 30) AS HUGEINT)) % 4294967296) * 13787848793156543929) % 18446744073709551616 + ((((CAST(xor(z, z >> 30) AS HUGEINT)) // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT) AS z FROM m1),
m3 AS (SELECT tok, CAST(((((CAST(xor(z, z >> 27) AS HUGEINT)) % 4294967296) * 10723151780598845931) % 18446744073709551616 + ((((CAST(xor(z, z >> 27) AS HUGEINT)) // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT) AS z FROM m2),
tokhash AS (SELECT tok, xor(z, z >> 31) AS h FROM m3),
votes AS (
  SELECT t.doc_id, b.b,
    SUM(CASE WHEN (th.h >> CAST(b.b AS INT)) & 1 = 1 THEN t.cnt ELSE -t.cnt END) AS acc
  FROM tokcnt t JOIN tokhash th USING (tok)
  CROSS JOIN (SELECT unnest(range(64)) AS b) b
  GROUP BY t.doc_id, b.b
),
sh AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN acc > 0
      THEN CAST(CAST(1 AS UBIGINT) << CAST(b AS INT) AS HUGEINT) ELSE 0 END) AS UBIGINT) AS h
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= 8"""

  /** q40: the q21 simhash pipeline run through the PRODUCTION capped
    * regime (maxBucket = 32 engages the salt-split tier on this corpus) —
    * banded buckets for maxHamming = 8 (9 pigeonhole bands), the
    * cap/split/sub-cap candidate machinery, then the exact hamming filter.
    */
  def q40SimhashCapped: String = {
    val cut = q21SimhashPairs.lastIndexOf("SELECT a.doc_id AS id_a")
    require(cut > 0, "q21 oracle shape changed; fix the q40 derivation")
    val base = q21SimhashPairs.substring(0, cut).trim
    require(base.endsWith(")"), "q21 oracle must end in a CTE before the final select")
    base + """,
bands AS (SELECT unnest(range(9)) AS b),
bucket40 AS MATERIALIZED (
  SELECT doc_id, b,
    (h >> CAST(b * 64 // 9 AS INT)) &
      ((CAST(1 AS UBIGINT) << CAST((b + 1) * 64 // 9 - b * 64 // 9 AS INT)) - 1) AS bk
  FROM sh CROSS JOIN bands
),
""" + cappedCandidatesSql("bucket40", 32) + """
SELECT c.id_a, c.id_b, CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b
WHERE bit_count(xor(a.h, b.h)) <= 8"""
  }

  /** SQL twin of `Sampling.stratifiedSample` at q63's configuration
    * (salt = 1; keep 1/2 of `en`, 1/4 of every other lang): the full
    * splitmix64 finalizer recomputed in UBIGINT/HUGEINT limb arithmetic
    * (same mulMod chain the q20/q40 oracles validated token-for-token),
    * then the sign-masked per-stratum residue test.
    */
  val q63StratifiedSample: String = s"""WITH s0 AS (
  SELECT doc_id, lang,
    CAST((CAST(CAST(doc_id + 1 AS UBIGINT) AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
  FROM documents),
s1 AS (SELECT doc_id, lang, ${mulMod(30, "13787848793156543929")} AS z FROM s0),
s2 AS (SELECT doc_id, lang, ${mulMod(27, "10723151780598845931")} AS z FROM s1),
m AS (
  SELECT doc_id, lang,
    (xor(z, z >> 31) & CAST(9223372036854775807 AS UBIGINT)) AS h,
    CAST(CASE WHEN lang = 'en' THEN 2 ELSE 4 END AS UBIGINT) AS den
  FROM s2)
SELECT doc_id, lang, CAST(h % den AS BIGINT) AS u
FROM m WHERE h % den < 1"""
}
