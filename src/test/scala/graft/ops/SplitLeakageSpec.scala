package graft.ops

import graft.SparkSuite

/** Split-leakage audit: category totals must reconcile exactly with
  * the near-dup pair list and the split assignment it composes. */
class SplitLeakageSpec extends SparkSuite {

  private lazy val rows = Dedup.splitLeakage(spark, sf("sf0.01")).collect()

  test("categories are unordered, flags consistent, fracs sum to 1") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "category not normalized")
      assert(r.getInt(4) == (if (r.getString(0) != r.getString(1)) 1 else 0))
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("totals reconcile with ngramJaccard x sampleSplit recomputation") {
    val pairs = Dedup.ngramJaccard(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.Tables.documents(spark, sf("sf0.01"))
      .createOrReplaceTempView("documents")
    val split = spark.sql(s"SELECT doc_id, " +
        s"${TextAnalysis.splitCase(SparkDialect)} AS split FROM documents")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toMap
    val want = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = rows.map(r =>
      ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == want)
    assert(rows.map(_.getLong(2)).sum == pairs.length.toLong)
  }

  test("engine == oracle SQL form (run by Spark)") {
    graft.Tables.documents(spark, sf("sf0.01"))
      .createOrReplaceTempView("documents")
    val sqlForm = spark.sql(Dedup.splitLeakageSql(SparkDialect)).collect()
    assert(rows.toSeq == sqlForm.toSeq)
  }
}
