package graft.ops

import graft.SparkSuite

/** IVF nprobe sweep: monotonicity of the cost/recall curve and parity
  * with the unrolled oracle form. */
class NprobeSweepSpec extends SparkSuite {

  private lazy val rows =
    Similarity.nprobeSweep(spark, sf("sf0.01")).collect()

  test("one row per swept setting, shared query sample") {
    assert(rows.map(_.getLong(0)).toSeq ==
      Similarity.SweepNprobes.map(_.toLong))
    assert(rows.map(_.getLong(1)).distinct.length == 1, "n_queries varies")
    assert(rows.head.getLong(1) > 0)
  }

  test("recall and candidate cost are non-decreasing in nprobe") {
    // candidates(np) is a superset of candidates(np-1); a truth member
    // can only be displaced from the served top-5 by another truth
    // member (anything ranked above it globally IS truth), so recall
    // cannot drop as the probe widens
    val rec = rows.map(_.getDouble(2)).toSeq
    val cand = rows.map(_.getDouble(3)).toSeq
    assert(rec == rec.sorted, s"recall not monotone: $rec")
    assert(cand == cand.sorted, s"candidates not monotone: $cand")
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("engine == unrolled SQL form (run by Spark)") {
    graft.Tables.embeddings(spark, sf("sf0.01"))
      .createOrReplaceTempView("embeddings")
    val sqlForm = spark.sql(Similarity.nprobeSweepSql(SparkDialect))
      .collect()
    assert(rows.toSeq == sqlForm.toSeq)
  }
}
