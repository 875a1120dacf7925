package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._

class QuarantineSpec extends SparkSuite {

  test("split routes every row to exactly one side with reasons attached") {
    import spark.implicits._
    val df = Seq(
      (Some("A"), Some(10.0)),
      (None, Some(20.0)),
      (Some("B"), None),
      (None, None)
    ).toDF("sym", "v")
    val (valid, rejects) = Quarantine.split(df, Seq(
      "null_sym" -> $"sym".isNotNull,
      "null_v" -> $"v".isNotNull))
    assert(valid.count() == 1)
    assert(rejects.count() == 3)
    val reasons = rejects.select($"sym", $"reject_reasons").collect()
      .map(r => r.getAs[String]("sym") -> r.getSeq[String](1).toSet).toMap
    assert(reasons(null) == Set("null_sym", "null_v") ||
      reasons(null) == Set("null_sym")) // (None,Some) vs (None,None) rows
    assert(reasons("B") == Set("null_v"))
  }

  test("event quarantine summary conserves the row count") {
    val out = Quarantine.eventQuarantineSummary(spark, sf()).collect()
      .map(r => r.getAs[String]("reason") -> r.getAs[Long]("n")).toMap
    val total = graft.Tables.events(spark, sf()).count()
    // valid + value_range rejects == all rows (no null symbol/ts in fixture)
    assert(out("__valid") + out.getOrElse("value_range", 0L) == total)
    assert(!out.contains("null_symbol") && !out.contains("null_ts"))
  }

  test("seed writer is idempotent (write-if-absent)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seed").toString + "/t"
    BarStore.seed(Seq((1, "a")).toDF("id", "v"), dir)
    BarStore.seed(Seq((2, "b")).toDF("id", "v"), dir) // ignored
    val rows = spark.read.parquet(dir).collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 1)
  }
}
