package graft.functions

import graft.SparkSuite
import graft.ops.{Dedup, SparkDialect}

class GraftSimHashSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  test("native signature equals the SQL sum-per-bit formulation") {
    val d = SparkDialect
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val native = spark.sql(
      s"""SELECT doc_id, graft_simhash(${d.tokens("text")}) AS simhash
         |FROM documents""".stripMargin)
      .filter(col("simhash").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sql = spark.sql(Dedup.simhashSqlSigForTest(d))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native.size == 500)
    assert(native == sql)
  }

  test("empty and single-token arrays behave like the explode form") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),          // no tokens → NULL (no row in SQL)
      (2L, Seq("alpha")),               // bits follow the single hash
      (3L, Seq("alpha", "alpha")),      // duplicates reinforce, same sign
      (4L, Seq("alpha", "beta"))
    ).toDF("id", "toks")
      .selectExpr("id", "graft_simhash(toks) AS sig")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(df(1L).isEmpty)
    val h = GraftH60.h60(org.apache.spark.unsafe.types.UTF8String.fromString("alpha"))
    // single token: signature bits are exactly the hash bits
    assert(df(2L).contains(h & ((1L << 60) - 1)))
    assert(df(3L) == df(2L)) // doubling every ±1 keeps every sign
  }
}
