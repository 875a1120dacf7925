package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import TextOps._

/** Similarity search over the `embeddings` table (Array[Float] → cast
  * to double before any arithmetic).
  *
  * Two paths, same query set (every vec_id ≡ 0 mod 100):
  *  - `topK`: exact brute-force cosine top-10 per query.  The query
  *    side is tiny and broadcast; the big side streams — per-partition
  *    scoring then a single narrow shuffle of (queries × candidates)
  *    survivors for the final ranking.  This is the correctness
  *    baseline any ANN variant is measured against.
  *  - `annLsh`: random-hyperplane LSH (16 deterministic integer-weight
  *    planes → 4 bands × 4 bits).  Candidates = vectors sharing any
  *    band value with the query (OR-amplification), ranked within the
  *    candidate set.  At 100 TB this is the scale path: the band join
  *    is an equi-join on (band, value) — no all-pairs product — and
  *    the plane projections are a narrow map over the scan.
  *
  * Plane weights come from a fixed affine formula (TextOps
  * .planeWeightSql), not an RNG, so engine and oracle agree exactly.
  */
object Similarity {

  private def baseCtes(d: SqlDialect): String =
    s"""e AS (
       |  SELECT vec_id, ${d.toDoubleArr("embedding")} AS v FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(${d.dot("v", "v")}) AS nrm FROM e)""".stripMargin

  /** Exact brute-force cosine top-10 per query vector. */
  def topKSql(d: SqlDialect): String = {
    s"""WITH ${baseCtes(d)},
       |q AS (
       |  SELECT vec_id, v, nrm FROM n WHERE vec_id % 100 = 0),
       |p AS (
       |  SELECT q.vec_id AS qid, n.vec_id AS nid,
       |    ${d.dot("q.v", "n.v")} / (q.nrm * n.nrm) AS cs
       |  FROM q JOIN n ON q.vec_id != n.vec_id),
       |r AS (
       |  SELECT qid, nid, cs,
       |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rn
       |  FROM p)
       |SELECT qid AS query_id, nid AS neighbor_id,
       |  round(cs, 6) AS cosine, CAST(rn AS BIGINT) AS rank
       |FROM r WHERE rn <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Signed projection onto deterministic hyperplane p (0-based dim). */
  private def projBit(d: SqlDialect, p: Int): String = {
    val proj = d.fold(
      d.arrTransform(d.sequence1(d.arrSize("v")), "i",
        s"${d.arrAt("v", "i")} * ${planeWeightSql(d, p.toString, "(i - 1)")}"),
      "CAST(0.0 AS DOUBLE)", "s", "x", "s + x")
    s"(CASE WHEN $proj > 0 THEN 1 ELSE 0 END)"
  }

  /** LSH-bucketed approximate top-5: candidates share ≥1 of 4 band
    * values (4 bits each from 16 hyperplane sign bits). */
  def annLshSql(d: SqlDialect): String = {
    val bitCols = (0 until AnnPlanes)
      .map(p => s"${projBit(d, p)} AS bit$p").mkString(",\n    ")
    val bandSelects = (0 until AnnBands).map { b =>
      val v = (0 until AnnBandBits)
        .map(r => s"bit${b * AnnBandBits + r} * ${1 << (AnnBandBits - 1 - r)}")
        .mkString(" + ")
      s"SELECT vec_id, $b AS band, ($v) AS bval FROM bits"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${baseCtes(d)},
       |bits AS (
       |  SELECT vec_id,
       |    $bitCols
       |  FROM n),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, x.vec_id AS nid
       |  FROM bands q JOIN bands x
       |    ON q.band = x.band AND q.bval = x.bval
       |   AND q.vec_id % 100 = 0 AND q.vec_id != x.vec_id),
       |p AS (
       |  SELECT c.qid, c.nid,
       |    ${d.dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cs
       |  FROM cand c
       |  JOIN n a ON a.vec_id = c.qid
       |  JOIN n b ON b.vec_id = c.nid),
       |r AS (
       |  SELECT qid, nid, cs,
       |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rn
       |  FROM p)
       |SELECT qid AS query_id, nid AS neighbor_id,
       |  round(cs, 6) AS cosine, CAST(rn AS BIGINT) AS rank
       |FROM r WHERE rn <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-style ANN: coarse quantization against 5 fixed centroids
    * (the vectors with vec_id ≡ 50 mod 100 — deterministic, no
    * k-means RNG), each vector assigned to its nearest centroid
    * (inverted lists), queries probe the nprobe=2 nearest lists and
    * rank only candidates there.  At 100 TB the assign step is a
    * broadcast map over the scan and each query touches ~2/5 of the
    * data — with real k-means centroids, a tunable fraction. */
  def ivfSql(d: SqlDialect): String = {
    s"""WITH ${baseCtes(d)},
       |c AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |  WHERE vec_id % 100 = 50),
       |asgn0 AS (
       |  SELECT n.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${d.dot("n.v", "c.cv")} / (n.nrm * c.cnrm) DESC, c.cid)
       |      AS crn
       |  FROM n CROSS JOIN c),
       |asgn AS (
       |  SELECT vec_id, cid FROM asgn0 WHERE crn = 1),
       |probe AS (
       |  SELECT vec_id AS qid, cid FROM asgn0
       |  WHERE vec_id % 100 = 0 AND crn <= 2),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS nid
       |  FROM probe p JOIN asgn a ON a.cid = p.cid AND a.vec_id != p.qid),
       |sc AS (
       |  SELECT cand.qid, cand.nid,
       |    ${d.dot("q.v", "x.v")} / (q.nrm * x.nrm) AS cs
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.qid
       |  JOIN n x ON x.vec_id = cand.nid),
       |r AS (
       |  SELECT qid, nid, cs,
       |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rn
       |  FROM sc)
       |SELECT qid AS query_id, nid AS neighbor_id,
       |  round(cs, 6) AS cosine, CAST(rn AS BIGINT) AS rank
       |FROM r WHERE rn <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    spark.sql(sql)
  }

  def topK(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, topKSql(SparkDialect))
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, annLshSql(SparkDialect))
  def ivf(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, ivfSql(SparkDialect))
}
