package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** T7 row-level error isolation (SURVEY.md §2.7, §7.3 "hard part"):
  * one bad row must never fail the batch.  Rows are validated against
  * named predicates; failures are routed to a quarantine output with
  * every violated rule attached, successes flow on untouched.
  *
  * The reference isolates at asset granularity with try/except
  * (`app/alpaca_service.py:167-177`); this generalizes it to row
  * granularity, purely declaratively — the rule array is a narrow
  * projection evaluated in one pass, no UDFs, no job-failing throw
  * path.  At 100 TB the quarantine side is written alongside the main
  * sink (same partitioning), keeping reprocessing cheap.
  */
object Quarantine {

  /** Split `df` into (valid, rejects-with-reasons) in one pass. */
  def split(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val reasons = array_compact(array(
      rules.map { case (name, pred) =>
        when(!coalesce(pred, lit(false)), lit(name)).otherwise(lit(null))
      }: _*))
    val tagged = df.withColumn("reject_reasons", reasons)
    (tagged.filter(size(col("reject_reasons")) === 0).drop("reject_reasons"),
      tagged.filter(size(col("reject_reasons")) > 0))
  }

  /** The standard event-feed rule set. `value <= 400` stands in for a
    * domain range check so the fixtures exercise the reject path. */
  def eventRules(): Seq[(String, Column)] = Seq(
    "null_symbol" -> col("event_type").isNotNull,
    "null_ts" -> col("ts").isNotNull,
    "value_range" -> (col("value").isNotNull && col("value") <= 400.0))

  /** Per-reason reject counts plus the surviving-row count — the
    * monitoring projection of the quarantine. */
  def eventQuarantineSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (valid, rejects) = split(Tables.events(spark, dir), eventRules())
    rejects
      .select(explode($"reject_reasons").as("reason"))
      .groupBy($"reason").agg(count(lit(1)).as("n"))
      .unionByName(valid.agg(count(lit(1)).as("n"))
        .select(lit("__valid").as("reason"), $"n"))
      // Same zero-count convention as the oracle's WHERE n > 0: on a
      // fixture where every row is rejected, '__valid' (count 0) must
      // not appear on one side only.
      .filter($"n" > 0)
      .orderBy($"reason")
  }

  def eventQuarantineOracleSql: String =
    s"""WITH e AS (SELECT * FROM events),
       |u AS (
       |  SELECT 'null_symbol' AS reason,
       |    sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS n FROM e
       |  UNION ALL
       |  SELECT 'null_ts', sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) FROM e
       |  UNION ALL
       |  SELECT 'value_range',
       |    sum(CASE WHEN value IS NULL OR value > 400.0 THEN 1 ELSE 0 END) FROM e
       |  UNION ALL
       |  SELECT '__valid',
       |    sum(CASE WHEN event_type IS NOT NULL AND ts IS NOT NULL
       |             AND value IS NOT NULL AND value <= 400.0
       |        THEN 1 ELSE 0 END) FROM e)
       |SELECT reason, CAST(n AS BIGINT) AS n FROM u
       |WHERE n > 0 ORDER BY reason""".stripMargin
}
