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

  /** Symmetric int8 quantization of the embedding column — the storage
    * compression step an ANN index runs before sharding vectors at
    * scale (4× smaller than float32, 8× smaller than the double work
    * form).  Per vector: scale = 127 / max|v_i|, code_i = ⌊v_i·scale +
    * 0.5⌋ (explicit floor(+0.5) instead of round() so the tie rule is
    * the same expression in both dialects), and the reported per-vector
    * reconstruction RMSE comes from the single-transform error array
    * v_i − code_i/scale.  max|code_i| = 127 by construction — no
    * clipping branch.
    *
    * Scale shape: a pure narrow projection (no shuffle but the oracle
    * ORDER BY); the lambda transforms are interpreted HOFs, so a fused
    * native Expression (GraftQuantize) is the optimization path if
    * this ever dominates a profile — at dim 64 the cost is dwarfed by
    * the scan. */
  def quantizeSql(d: SqlDialect): String = {
    val absMax = d.arrMax(d.arrTransform("v", "x", "abs(x)"))
    val err = d.arrTransform("v", "x",
      "x - floor(x * scale + 0.5) / scale")
    s"""WITH e AS (
       |  SELECT vec_id, ${d.toDoubleArr("embedding")} AS v FROM embeddings),
       |s AS (
       |  SELECT vec_id, v, ${d.dlit(127.0)} / $absMax AS scale FROM e),
       |q AS (
       |  SELECT vec_id, scale, ${d.arrSize("v")} AS dim, $err AS err FROM s),
       |r AS (
       |  SELECT vec_id, scale, ${d.dot("err", "err")} / dim AS mse FROM q)
       |SELECT vec_id, round(scale, 6) AS scale,
       |  round(sqrt(mse), 6) AS rmse
       |FROM r
       |ORDER BY vec_id""".stripMargin
  }

  /** Top-k search served FROM the int8 codes (the `quantizeSql`
    * quantizer): scores are integer-valued dot products of the code
    * arrays, de-scaled by the two quantization scales and the true
    * norms — the memory-bandwidth-lean serving mode of a quantized
    * index (4× fewer bytes than float32 through the scan; the integer
    * dot is exact in doubles since |code| ≤ 127).  Ranking may differ
    * from `sim_topk_bruteforce` near ties (quantization noise ~1e-3
    * cosine at dim 64) — that approximation is itself deterministic
    * and oracle-checked, and `SimilaritySpec` pins the agreement with
    * the exact operator.  Ties in the quantized score break on
    * neighbor id exactly like the exact operator. */
  def quantizedTopKSql(d: SqlDialect): String = {
    val absMax = d.arrMax(d.arrTransform("v", "x", "abs(x)"))
    val code = d.arrTransform("v", "x",
      "CAST(floor(x * scale + 0.5) AS DOUBLE)")
    s"""WITH e AS (
       |  SELECT vec_id, ${d.toDoubleArr("embedding")} AS v FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(${d.dot("v", "v")}) AS nrm FROM e),
       |s AS (
       |  SELECT vec_id, v, nrm, ${d.dlit(127.0)} / $absMax AS scale FROM n),
       |qz AS (
       |  SELECT vec_id, nrm, scale, $code AS code FROM s),
       |q AS (
       |  SELECT vec_id, nrm, scale, code FROM qz WHERE vec_id % 100 = 0),
       |p AS (
       |  SELECT q.vec_id AS qid, x.vec_id AS nid,
       |    ${d.dot("q.code", "x.code")} / (q.scale * x.scale)
       |      / (q.nrm * x.nrm) AS cs
       |  FROM q JOIN qz x ON q.vec_id != x.vec_id),
       |r AS (
       |  SELECT qid, nid, cs,
       |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rn
       |  FROM p)
       |SELECT qid AS query_id, nid AS neighbor_id,
       |  round(cs, 6) AS approx_cosine, CAST(rn AS BIGINT) AS rank
       |FROM r WHERE rn <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Signed projection onto deterministic hyperplane p: a dot product
    * against the literal weight array (codegen'd graft_dot on the
    * engine side; same left-to-right fold as the HOF form it replaced). */
  private def projBit(d: SqlDialect, p: Int): String = {
    val proj = d.dot("v", d.arrOf(planeWeights(p).map(d.dlit)))
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

  /** IVF with TRAINED centroids: spherical k-means (cosine Lloyd
    * iterations) instead of ivfSql's fixed picks, then the same
    * nprobe=2 search.  Fully oracle-checked despite float centroids:
    * the per-cluster mean accumulates µ-quantized integer components
    * (`CAST(round(x·10⁶) AS BIGINT)`), whose sum is associative and
    * commutative — so the centroid is bit-identical regardless of
    * Spark's partial-aggregation order, and the DuckDB oracle lands on
    * the same doubles.  Assignment ties break on cid; no RNG anywhere
    * (init = the same deterministic vec_id ≡ 50 picks).
    *
    * Scale: each Lloyd round is one broadcast-size cross join (k rows)
    * + one groupBy(cid) with map-side partial sums of k·D longs — the
    * textbook distributed k-means step; iterations are unrolled (2
    * here), so the plan is static and codegen-friendly. */
  val KmeansDim: Int = EmbeddingDim // single source for the fixture dim
  val KmeansIters = 2
  val KmeansQuant = "1000000.0"

  def ivfKmeansSql(d: SqlDialect): String = {
    // One Lloyd round: assignments from centroid relation `cPrev` →
    // quantized per-dimension means → centroid relation `cNext`.
    def cosTo(c: String): String =
      s"${d.dot("n.v", s"$c.cv")} / (n.nrm * $c.cnrm)"
    def assignCtes(i: Int, cPrev: String): String =
      s"""x$i AS (
         |  SELECT n.vec_id, c.cid, ${cosTo("c")} AS cs
         |  FROM n CROSS JOIN $cPrev c),
         |a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |    FROM x$i) z WHERE rn = 1)""".stripMargin
    def updateCtes(i: Int): String = {
      val sums = (0 until KmeansDim).map(j =>
        s"sum(CAST(round(${d.arrAt("n.v", (j + 1).toString)} * $KmeansQuant) AS BIGINT)) AS s$j")
        .mkString(", ")
      val comps = (0 until KmeansDim).map(j =>
        s"CAST(s$j AS DOUBLE) / ($KmeansQuant * cnt)")
      s"""s${i + 1} AS (
         |  SELECT a.cid, count(*) AS cnt, $sums
         |  FROM a$i a JOIN n ON n.vec_id = a.vec_id
         |  GROUP BY a.cid),
         |m${i + 1} AS (
         |  SELECT cid, ${d.arrOf(comps)} AS cv FROM s${i + 1}),
         |c${i + 1} AS (
         |  SELECT cid, cv, sqrt(${d.dot("cv", "cv")}) AS cnrm FROM m${i + 1})""".stripMargin
    }
    val lloyd = (0 until KmeansIters).map { i =>
      s"${assignCtes(i, s"c$i")},\n${updateCtes(i)}"
    }.mkString(",\n")
    val f = KmeansIters // final centroid relation index
    s"""WITH ${baseCtes(d)},
       |c0 AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |  WHERE vec_id % 100 = 50),
       |$lloyd,
       |xf AS (
       |  SELECT n.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${cosTo("c")} DESC, c.cid) AS crn
       |  FROM n CROSS JOIN c$f c),
       |asgn AS (
       |  SELECT vec_id, cid FROM xf WHERE crn = 1),
       |probe AS (
       |  SELECT vec_id AS qid, cid FROM xf
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

  /** ANN recall measurement: per query vector, the fraction of the
    * TRUE cosine top-5 (`topK` restricted to rank ≤ 5 — the exact
    * brute-force baseline) that each approximate variant recovers.
    * Deterministic inputs make approximation quality itself an
    * oracle-checked result instead of a prose claim: the DuckDB oracle
    * recomputes all four pipelines independently and must land on the
    * same per-query fractions.
    *
    * This is a measurement harness, so it deliberately pays the cost
    * of all four pipelines (truth + 3 ANN variants); production runs
    * it on a sampled query set, not the full corpus.  The joins are
    * tiny (k rows per query) — cost is dominated by the four
    * pipelines themselves. */
  def recall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val truth = topK(spark, dir).filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id")
    val tc = truth.groupBy($"query_id").agg(count(lit(1)).as("n_true"))
    def matched(ann: DataFrame, name: String): DataFrame =
      truth.join(ann.select($"query_id", $"neighbor_id"),
          Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as(name))
    tc
      .join(matched(annLsh(spark, dir), "m_lsh"), Seq("query_id"), "left")
      .join(matched(ivf(spark, dir), "m_ivf"), Seq("query_id"), "left")
      .join(matched(ivfKmeans(spark, dir), "m_km"), Seq("query_id"), "left")
      .select($"query_id", $"n_true",
        round(coalesce($"m_lsh", lit(0L)).cast("double") / $"n_true", 6)
          .as("recall_lsh"),
        round(coalesce($"m_ivf", lit(0L)).cast("double") / $"n_true", 6)
          .as("recall_ivf"),
        round(coalesce($"m_km", lit(0L)).cast("double") / $"n_true", 6)
          .as("recall_kmeans"))
      .orderBy($"query_id")
  }

  /** Oracle form of `recall`: the four pipelines as nested-WITH
    * subqueries (their CTE names are scoped locally), joined on
    * (query_id, neighbor_id). */
  def recallSql(d: SqlDialect): String = {
    def m(name: String, sub: String): String =
      s"""$name AS (
         |  SELECT t.query_id, count(*) AS m FROM truth t
         |  JOIN ($sub) a
         |    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |  GROUP BY t.query_id)""".stripMargin
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (${topKSql(d)}) t
       |  WHERE rank <= 5),
       |tc AS (
       |  SELECT query_id, count(*) AS n_true FROM truth GROUP BY query_id),
       |${m("ml", annLshSql(d))},
       |${m("mi", ivfSql(d))},
       |${m("mk", ivfKmeansSql(d))}
       |SELECT tc.query_id, CAST(tc.n_true AS BIGINT) AS n_true,
       |  round(CAST(COALESCE(ml.m, 0) AS DOUBLE) / tc.n_true, 6) AS recall_lsh,
       |  round(CAST(COALESCE(mi.m, 0) AS DOUBLE) / tc.n_true, 6) AS recall_ivf,
       |  round(CAST(COALESCE(mk.m, 0) AS DOUBLE) / tc.n_true, 6) AS recall_kmeans
       |FROM tc
       |LEFT JOIN ml ON ml.query_id = tc.query_id
       |LEFT JOIN mi ON mi.query_id = tc.query_id
       |LEFT JOIN mk ON mk.query_id = tc.query_id
       |ORDER BY tc.query_id""".stripMargin
  }

  /** IVF with a PERSISTED index — the 100 TB deployment shape of
    * `sim_ann_ivf`: the inverted lists are written ONCE as a parquet
    * table partitioned by centroid id (`cid=<id>/` directories), and
    * each probe then reads only the probed list partitions.  Pruning
    * is static: the probed cid set (≤ nprobe per query — tiny ints,
    * the same driver-side scalar shape as the k-means codebook
    * collect) lands in the scan's `PartitionFilters`, so the files of
    * unprobed lists are never opened — at scale a query touches
    * nprobe/k of the index bytes regardless of corpus size.
    *
    * Same centroids (vec_id ≡ 50 mod 100), assignment tie-break, and
    * scoring arithmetic as `ivfSql`; the float parquet round-trip is
    * exact, so results are identical to `sim_ann_ivf` and the same
    * oracle SQL verifies this path.  The index build is write-if-
    * absent keyed on the dataset dir (one shuffle-by-list write). */
  def ivfPersisted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val n = RelationCache.cached(spark, s"ivf_base:$dir") {
      Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding",
          expr(SparkDialect.toDoubleArr("embedding")).as("v"))
        .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    }
    val c = broadcast(n.filter($"vec_id" % 100 === 50)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"nrm".as("cnrm")))
    val scored = n.crossJoin(c)
      .withColumn("cs", expr("graft_dot(v, cv)") / ($"nrm" * $"cnrm"))
    // The index is keyed by the dataset path: the readable sanitized
    // name plus the full path's hash so two paths that sanitize alike
    // cannot collide.  Contract: the index is immutable once written —
    // callers that regenerate the dataset IN PLACE must delete the
    // store dir to force a rebuild (the same refresh rule as any
    // external index).  Existence goes through Hadoop's FileSystem so
    // the check is correct on non-local storage too (java.io.File is
    // always false for hdfs:// / s3a:// — see BarStore.merge).
    val store = new org.apache.hadoop.fs.Path(
      sys.props("java.io.tmpdir"),
      "graft_ivf_" + dir.replaceAll("[^A-Za-z0-9.]", "_") +
        "_" + java.lang.Integer.toHexString(dir.hashCode))
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(store, "_SUCCESS"))) {
      val asgn = scored.groupBy($"vec_id")
        .agg(max_by($"cid", struct($"cs", -$"cid")).as("cid"))
      n.select($"vec_id", $"embedding").join(asgn, "vec_id")
        .write.mode("overwrite").partitionBy("cid")
        .parquet(store.toString)
    }
    // top-nprobe centroids per query — the window runs over the tiny
    // query subset only (k rows per query), never the full corpus
    val probe = scored.filter($"vec_id" % 100 === 0)
      .withColumn("crn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cs".desc, $"cid")))
      .filter($"crn" <= 2)
      .select($"vec_id".as("qid"), $"cid")
    val probedCids = probe.select($"cid").distinct().as[Long].collect().sorted
    // pin the partition column type (inference would read cid=150 as
    // INT and the long comparison's cast could fall out of
    // PartitionFilters)
    val lists = spark.read
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, cid BIGINT")
      .parquet(store.toString)
      .filter($"cid".isin(probedCids: _*))
      .select($"vec_id", $"cid",
        expr(SparkDialect.toDoubleArr("embedding")).as("nv"))
      .withColumn("nn", expr("sqrt(graft_dot(nv, nv))"))
    val cand = lists.join(broadcast(probe), "cid")
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"), $"nv", $"nn")
    cand
      .join(broadcast(n.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))), "qid")
      .select($"qid", $"nid",
        expr("graft_dot(qv, nv)").divide($"qn" * $"nn").as("cs"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cs".desc, $"nid")))
      .filter($"rn" <= 5)
      .select($"qid".as("query_id"), $"nid".as("neighbor_id"),
        round($"cs", 6).as("cosine"), $"rn".cast("long").as("rank"))
      .orderBy($"query_id", $"rank")
  }

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    spark.sql(sql)
  }

  def topK(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, topKSql(SparkDialect))
  def quantize(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, quantizeSql(SparkDialect))
  def quantizedTopK(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, quantizedTopKSql(SparkDialect))
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, annLshSql(SparkDialect))
  def ivf(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, ivfSql(SparkDialect))

  /** Engine-side k-means IVF: the single-statement SQL form (kept as
    * the oracle) inlines the whole Lloyd chain at every reference, so
    * Spark would recompute each round several times.  Distributed
    * k-means is naturally driver-coordinated instead: centroids are k·D
    * numbers, so each round is ONE aggregation job (map-side partial
    * sums of quantized longs) whose k-row result is collected and
    * inlined into the next round's assignment projection — the
    * DataFrame equivalent of broadcasting the codebook.  All arithmetic
    * (quantized sums, µ/10⁶/n division, left-to-right dot folds, tie on
    * cid) is identical to the oracle SQL, so results stay bit-equal. */
  def ivfKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    graft.functions.GraftFunctions.register(spark)
    val quant = KmeansQuant.toDouble
    // session-scoped cached relation (RelationCache): repeated bench /
    // verify invocations reuse one cache entry instead of pinning a new
    // one per call
    val n = RelationCache.cached(spark, s"kmeans_base:$dir") {
      Tables.embeddings(spark, dir)
        .select($"vec_id", expr(
          SparkDialect.toDoubleArr("embedding")).as("v"))
        .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    }

    def lit64(a: Array[Double]): Column =
      array(a.map(lit(_)): _*)
    // cosine of v against a literal centroid (same fold as the oracle)
    def cosTo(cv: Array[Double], cnrm: Double): Column =
      call_function("graft_dot", $"v", lit64(cv)).divide($"nrm" * lit(cnrm))
    def dotSelf(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }; s
    }

    // init: deterministic picks, ordered by cid
    var cents: Seq[(Long, Array[Double], Double)] =
      n.filter($"vec_id" % 100 === 50).orderBy($"vec_id").collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, math.sqrt(dotSelf(v)))
      }.toSeq

    // per-row centroid ranking: ascending (-cs, cid) struct sort ≡ the
    // oracle's ORDER BY cs DESC, cid (exact for non-NaN doubles)
    def ordCol(): Column = array_sort(array(cents.map {
      case (cid, cv, cnrm) =>
        struct((-cosTo(cv, cnrm)).as("ncs"), lit(cid).as("cid"))
    }: _*))

    for (_ <- 0 until KmeansIters) {
      val sums = (0 until KmeansDim).map(j =>
        sum(round(element_at($"v", j + 1) * quant).cast("long")).as(s"s$j"))
      val updated = n.withColumn("cid", ordCol()(0).getField("cid"))
        .groupBy($"cid")
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect()
      cents = updated.map { r =>
        val cnt = r.getLong(1)
        val cv = Array.tabulate(KmeansDim)(j =>
          r.getLong(2 + j).toDouble / (quant * cnt))
        (r.getLong(0), cv, math.sqrt(dotSelf(cv)))
      }.sortBy(_._1).toSeq
    }

    val ranked = n.withColumn("ord", ordCol())
    val asgn = ranked.select($"vec_id", $"ord"(0).getField("cid").as("cid"))
    val probe = ranked.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), explode(slice($"ord", 1, 2)).as("p"))
      .select($"qid", $"p.cid".as("cid"))
    val cand = probe.join(asgn, "cid")
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"))
    val sc = cand
      .join(n.select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn")), "qid")
      .join(n.select($"vec_id".as("nid"), $"v".as("nv"), $"nrm".as("nn")), "nid")
      .select($"qid", $"nid",
        expr("graft_dot(qv, nv)").divide($"qn" * $"nn").as("cs"))
    import org.apache.spark.sql.expressions.Window
    sc.withColumn("rn",
        row_number().over(Window.partitionBy($"qid")
          .orderBy($"cs".desc, $"nid")))
      .filter($"rn" <= 5)
      .select($"qid".as("query_id"), $"nid".as("neighbor_id"),
        round($"cs", 6).as("cosine"), $"rn".cast("long").as("rank"))
      .orderBy($"query_id", $"rank")
  }
}
