package graft.ops

import graft.SparkSuite

/** The KMV distinct sketch (Relational.qKmvDistinct): deterministic,
  * exact below k, and within the estimator's error envelope above it. */
class KmvSketchSpec extends SparkSuite {
  import spark.implicits._

  test("estimate is deterministic and tracks the exact NDV") {
    val est = Relational.qKmvDistinct(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est2 = Relational.qKmvDistinct(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == est2) // no RNG anywhere
    val exact = graft.Tables.lineitem(spark, sf())
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct($"l_orderkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (flag, nd) =>
      val e = est(flag)
      if (nd < Relational.KmvK) assert(e == nd) // small groups are exact
      else {
        // KMV standard error ≈ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 4σ
        val rel = math.abs(e - nd).toDouble / nd
        assert(rel < 0.5, s"$flag: est $e vs exact $nd (rel err $rel)")
      }
    }
  }
}
