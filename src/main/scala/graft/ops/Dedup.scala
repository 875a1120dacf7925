package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import TextOps._

/** Deduplication operators over `documents` / `embeddings`: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup — the standard near-duplicate toolkit for
  * large-scale training-data curation (cf. the dedup pipelines in
  * PAPERS.md).
  *
  * Engine (SparkDialect) and oracle (DuckDialect) are generated from
  * the same dialect-parameterized SQL, with engine-portable hashing
  * (TextOps.h60) so MinHash/SimHash signatures agree bit-for-bit.
  *
  * Scale design (100 TB):
  *  - Exact dedup: one hash-shuffle on the content digest; map-side
  *    partial aggregation applies.  Never compares full texts.
  *  - N-gram / MinHash / SimHash: candidate generation is *blocked*
  *    (shared shingle, shared LSH band, shared SimHash band) so the
  *    all-pairs O(n²) never materializes — candidates ≪ n².  The
  *    verify step touches only candidate pairs.
  *  - SimHash banding (8 bands × 4 bits) is provably complete for
  *    Hamming distance ≤ 7 by pigeonhole, so the banded engine result
  *    equals the oracle's brute-force all-pairs scan — an
  *    algorithm-independent correctness check.
  *  - Embedding near-dup is exact all-pairs here (the verify gate runs
  *    at small n); the LSH-bucketed scale path is `Similarity.annLsh`.
  */
object Dedup {

  /** Exact dedup: md5 over whitespace-collapsed lowercase text; every
    * doc mapped to its group representative (min doc_id). */
  def exactSql(d: SqlDialect): String = {
    val norm = d.reReplace("trim(lower(text))", "\\s+", " ")
    s"""WITH n AS (
       |  SELECT doc_id, md5($norm) AS text_md5 FROM documents),
       |g AS (
       |  SELECT text_md5, min(doc_id) AS rep_doc_id,
       |         count(*) AS group_size
       |  FROM n GROUP BY text_md5)
       |SELECT n.doc_id, g.rep_doc_id, g.group_size,
       |  CAST(n.doc_id != g.rep_doc_id AS BOOLEAN) AS is_duplicate
       |FROM n JOIN g ON n.text_md5 = g.text_md5
       |ORDER BY n.doc_id""".stripMargin
  }

  /** Word-3-gram Jaccard near-dup pairs (J ≥ 0.5).  Candidates are
    * blocked on shared shingles (complete for J > 0), the Jaccard is
    * computed from the inverted-index join counts alone — no array
    * intersection on the pair side. */
  def ngramJaccardSql(d: SqlDialect): String = {
    s"""WITH t AS (
       |  SELECT doc_id, ${d.shingles3(d.tokens("text"))} AS grams FROM documents),
       |s AS (
       |  SELECT doc_id, grams, ${d.arrSize("grams")} AS ng FROM t
       |  WHERE ${d.arrSize("grams")} > 0),
       |e AS (
       |  SELECT doc_id, ng, ${d.explode("grams")} AS gram FROM s),
       |c AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib,
       |         max(a.ng) AS na, max(b.ng) AS nb,
       |         CAST(count(*) AS DOUBLE) AS shared
       |  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT ia AS doc_id_a, ib AS doc_id_b,
       |  round(shared / (na + nb - shared), 6) AS jaccard
       |FROM c
       |WHERE shared / (na + nb - shared) >= 0.5
       |ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  /** MinHash signature components: for perm i,
    * h_i = min over shingles of (a_i * (h60(gram) % P) + b_i) % P. */
  private def minhashSigExprs: Seq[String] =
    (0 until NumPerms).map { i =>
      s"min((${permA(i)} * g + ${permB(i)}) % $P) AS h$i"
    }

  /** Band key: concat of the band's 4 signature components. */
  private def bandKey(d: SqlDialect, b: Int, qual: String = ""): String =
    (0 until RowsPerBand)
      .map(r => d.castStr(s"$qual" + s"h${b * RowsPerBand + r}"))
      .mkString(" || '_' || ")

  /** MinHash + LSH near-dup: banded candidate generation (8 bands × 4
    * rows over 32 perms), est. similarity from signature agreement,
    * exact Jaccard verification (J ≥ 0.5) on candidate pairs only. */
  def minhashLshSql(d: SqlDialect): String = {
    val bandSelects = (0 until Bands).map { b =>
      s"SELECT doc_id, $b AS band, ${bandKey(d, b)} AS bkey FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val sigMatches = (0 until NumPerms)
      .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, ${d.shingles3(d.tokens("text"))} AS grams FROM documents),
       |s AS (
       |  SELECT doc_id, grams, ${d.arrSize("grams")} AS ng FROM t
       |  WHERE ${d.arrSize("grams")} > 0),
       |e AS (
       |  SELECT doc_id, ${d.explode("grams")} AS gram FROM s),
       |gh AS (
       |  SELECT doc_id, (${d.h60("gram")} % $P) AS g FROM e),
       |sig AS (
       |  SELECT doc_id, ${minhashSigExprs.mkString(", ")}
       |  FROM gh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |scored AS (
       |  SELECT c.ia, c.ib,
       |    CAST(($sigMatches) AS DOUBLE) / $NumPerms AS est_sim,
       |    CAST(${d.arrIntersectSize("ga.grams", "gb.grams")} AS DOUBLE)
       |      / (ga.ng + gb.ng - ${d.arrIntersectSize("ga.grams", "gb.grams")}) AS jaccard
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.ia
       |  JOIN sig sb ON sb.doc_id = c.ib
       |  JOIN s ga ON ga.doc_id = c.ia
       |  JOIN s gb ON gb.doc_id = c.ib)
       |SELECT ia AS doc_id_a, ib AS doc_id_b,
       |  round(est_sim, 6) AS est_sim, round(jaccard, 6) AS jaccard
       |FROM scored
       |WHERE jaccard >= 0.5
       |ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  /** 32-bit SimHash from token counts: bit j set iff the count-weighted
    * sum of (±1 per word-hash bit j) is positive. */
  private def simhashCte(d: SqlDialect): String = {
    val sums = (0 until SimHashBits).map { j =>
      s"sum(c * (2 * ((${d.shiftRight("h", j.toString)}) & 1) - 1)) AS s$j"
    }.mkString(", ")
    val sig = (0 until SimHashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""w AS (
       |  SELECT doc_id, ${d.explode(d.tokens("text"))} AS word FROM documents),
       |wc AS (
       |  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
       |wh AS (
       |  SELECT doc_id, c, ${d.h60("word")} AS h FROM wc),
       |bits AS (
       |  SELECT doc_id, $sums FROM wh GROUP BY doc_id),
       |sig AS (
       |  SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  /** SimHash near-dup pairs with Hamming distance ≤ 7, found via
    * band-blocked candidates (complete by pigeonhole — see header). */
  def simhashSql(d: SqlDialect): String = {
    val mask = (1 << SimHashBandBits) - 1
    val bandSelects = (0 until SimHashBands).map { b =>
      s"SELECT doc_id, simhash, $b AS band, " +
        s"((${d.shiftRight("simhash", (b * SimHashBandBits).toString)}) & $mask) AS bval FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${simhashCte(d)},
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
       |         a.simhash AS sa, b.simhash AS sb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
       |SELECT ia AS doc_id_a, ib AS doc_id_b,
       |  CAST(bit_count(${d.xor("sa", "sb")}) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(${d.xor("sa", "sb")}) <= $SimHashMaxHamming
       |ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  /** Oracle-side SimHash: brute-force all-pairs Hamming scan — a
    * different algorithm that must produce the identical result set,
    * because banded candidate generation is complete for distance ≤ 7. */
  def simhashBruteSql(d: SqlDialect): String =
    s"""WITH ${simhashCte(d)}
       |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       |  CAST(bit_count(${d.xor("a.simhash", "b.simhash")}) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(${d.xor("a.simhash", "b.simhash")}) <= $SimHashMaxHamming
       |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** Embedding cosine near-dup pairs (cos ≥ 0.4), exact all-pairs with
    * pre-computed norms.  Identical left-to-right double fold on both
    * sides → bit-identical cosines. */
  def embeddingCosineSql(d: SqlDialect): String = {
    s"""WITH e AS (
       |  SELECT vec_id, ${d.toDoubleArr("embedding")} AS v FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(${d.dot("v", "v")}) AS nrm FROM e)
       |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       |  round(${d.dot("a.v", "b.v")} / (a.nrm * b.nrm), 6) AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ${d.dot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.4
       |ORDER BY vec_id_a, vec_id_b""".stripMargin
  }

  private def runDocs(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql(sql)
  }

  def exact(spark: SparkSession, dir: String): DataFrame =
    runDocs(spark, dir, exactSql(SparkDialect))
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    runDocs(spark, dir, ngramJaccardSql(SparkDialect))
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    runDocs(spark, dir, minhashLshSql(SparkDialect))
  def simhash(spark: SparkSession, dir: String): DataFrame =
    runDocs(spark, dir, simhashSql(SparkDialect))
  def embeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    spark.sql(embeddingCosineSql(SparkDialect))
  }
}
