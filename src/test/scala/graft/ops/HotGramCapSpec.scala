package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** The hot-gram document-frequency cap on the ENGINE's executed
  * DataFrame paths (Dedup.ngramJaccardCapped, TextAnalysis
  * .contaminationCapped): on a boilerplate-heavy corpus — every doc
  * ends with the same viral sentence — candidate generation must stay
  * bounded (no O(f²) fan-out on the hot shingles) while the fold-back
  * keeps every reported score bit-identical to the uncapped
  * computation.  Expected values are re-derived in plain Scala from
  * the collected shingle sets — an independent computation, not a
  * replay of the SQL. */
class HotGramCapSpec extends SparkSuite {

  // 10 tokens → 8 shingles, shared by every document: the skew bomb
  private val boiler = "this software is provided without any warranty of any kind"

  /** 20 boilerplate-only docs + one genuine near-dup pair (100, 101)
    * sharing a 21-token body that differs in one word. */
  private lazy val docs: DataFrame = {
    import spark.implicits._
    val body = (1 to 20).map(i => s"x$i").mkString(" ")
    val rows =
      (0L until 20L).map(i =>
        i -> s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f $boiler") ++
        Seq(100L -> s"$body q100 $boiler", 101L -> s"$body q101 $boiler")
    rows.toDF("doc_id", "text")
  }

  /** Exploded posting relation (doc_id, ng, gram) via the same native
    * shingle chain the engine paths use. */
  private def postings: DataFrame =
    docs.selectExpr("doc_id", "graft_shingles3(graft_tokens(text)) AS grams")
      .selectExpr("doc_id", "size(grams) AS ng", "explode(grams) AS gram")

  /** Shingle set per doc, collected once for the Scala re-derivations. */
  private lazy val gramSets: Map[Long, Set[String]] =
    docs.selectExpr("doc_id", "graft_shingles3(graft_tokens(text)) AS grams")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap

  test("cap bounds candidate generation on a boilerplate-heavy corpus") {
    import org.apache.spark.sql.functions._
    val e = postings
    val (cold, hotPerDoc) = TextOps.capPostings(e, 3)
    // every cold gram is within the cap — the candidate join's per-key
    // fan-out is bounded by maxDf² regardless of corpus skew
    val coldMax = cold.groupBy("gram").count().agg(max("count")).head.getLong(0)
    assert(coldMax <= 3, s"cold posting df $coldMax exceeds the cap")
    // the 8 boilerplate shingles (df = 22) are hot for every doc
    val hot = hotPerDoc.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(hot.size == 22)
    assert(hot.values.forall(_.length == 8))
    // the quadratic fan-out is gone: uncapped join emits ~8·C(22,2)
    // candidate rows from the boilerplate alone, capped only the
    // genuine near-dup body grams
    def pairRows(p: DataFrame): Long = p.as("a")
      .join(p.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .count()
    val uncapped = pairRows(e)
    val capped = pairRows(cold)
    assert(uncapped > 8L * 21 * 22 / 2, s"corpus not boilerplate-heavy: $uncapped")
    assert(capped * 10 < uncapped, s"capped $capped vs uncapped $uncapped")
  }

  test("ngram jaccard fold-back reproduces the uncapped scores exactly") {
    val capped = Dedup.ngramJaccardCapped(postings, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val uncapped = Dedup.ngramJaccardCapped(postings, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // boilerplate-only overlap stays below the 0.5 threshold here, so
    // nothing is lost to the cap: the two results must be identical
    assert(capped == uncapped)
    // the independent Scala derivation of the planted pair's Jaccard
    val (a, b) = (gramSets(100L), gramSets(101L))
    val expected = a.intersect(b).size.toDouble / a.union(b).size
    assert(capped.keySet == Set(100L -> 101L))
    assert(capped(100L -> 101L) ==
      BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("contamination cap folds hot grams back and drops boilerplate-only hits") {
    import org.apache.spark.sql.functions._
    // eval docs: 100 (genuinely contaminated by train doc 101) and 5
    // (boilerplate-only overlap with every train doc)
    val e = docs.selectExpr("doc_id", "graft_shingles3(graft_tokens(text)) AS grams")
      .selectExpr("doc_id", "explode(grams) AS gram")
      .withColumn("split",
        when(col("doc_id").isin(100L, 5L), "val").otherwise("train"))
      .select("doc_id", "split", "gram")
    val rows = TextAnalysis.contaminationCapped(e, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 100: reported against 101 with the FULL shared-gram count —
    // cold body grams + the 8 hot boilerplate grams folded back
    val expectedShared = gramSets(100L).intersect(gramSets(101L)).size.toLong
    assert(rows(100L) == ((1L, 101L, expectedShared)))
    // doc 5 overlaps train docs only through the hot boilerplate —
    // dropped by design (a pair with zero cold shared grams is
    // boilerplate-only, not contamination), keeping candidates bounded
    assert(!rows.contains(5L))
    assert(rows.keySet == Set(100L))
  }

  test("contamination risk surfaces the eval docs where the blind spot is live") {
    import org.apache.spark.sql.functions._
    val e = docs.selectExpr("doc_id", "graft_shingles3(graft_tokens(text)) AS grams")
      .selectExpr("doc_id", "explode(grams) AS gram")
      .withColumn("split",
        when(col("doc_id").isin(100L, 5L), "val").otherwise("train"))
      .select("doc_id", "split", "gram")
    val risk = TextAnalysis.contaminationRiskCapped(e, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both eval docs carry the 8 hot boilerplate shingles — ≥ 3, so a
    // train pair COULD hide entirely inside hot grams for either; doc 5
    // is exactly the case contaminationCapped drops, and the risk
    // relation is what tells the user that drop happened
    assert(risk == Map(100L -> 8L, 5L -> 8L))
    // raising maxDf above the boilerplate df (22) leaves no hot grams:
    // the risk relation empties — blind spot provably dead at that cap
    assert(TextAnalysis.contaminationRiskCapped(e, 30).isEmpty)
  }

  test("capped engine paths match the dialect-shared SQL forms on the fixtures") {
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val ngEngine = Dedup.ngramJaccard(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ngSql = spark.sql(Dedup.ngramJaccardSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ngEngine == ngSql)
    val ctEngine = TextAnalysis.contamination(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val ctSql = spark.sql(TextAnalysis.contaminationSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ctEngine == ctSql)
    val rkEngine = TextAnalysis.contaminationRisk(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val rkSql = spark.sql(TextAnalysis.contaminationRiskSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rkEngine == rkSql)
  }
}
