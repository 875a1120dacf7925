package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked query over the custom DSv2 bar source: scan a
  * symbol set for Q1 2024, narrow to Feb–Mar with a timestamp
  * predicate (exercises the connector's range pushdown — the January
  * bars are never generated), and aggregate per symbol-month. */
object BarSourceQueries {

  val Symbols = "AAPL,MSFT,GOOG"

  def srcBarScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read
      .format("graft.sources.BarDataSource")
      .option("symbols", Symbols)
      .option("start", "2024-01-01")
      .option("end", "2024-03-31")
      .load()
      .filter($"timestamp" >= to_timestamp(lit("2024-02-01")))
      .groupBy($"symbol", month($"timestamp").as("m"))
      .agg(count(lit(1)).as("n_bars"),
        round(sum($"close"), 4).as("sum_close"),
        round(min($"low"), 4).as("min_low"),
        round(max($"high"), 4).as("max_high"),
        sum($"volume").as("sum_volume"))
      .orderBy($"symbol", $"m")
  }

  /** DuckDB mirror of BarGen: same md5→60-bit hash, same arithmetic. */
  def srcBarScanOracleSql: String = {
    val h = (suffix: String) =>
      s"CAST(CAST('0x' || substr(md5(s || '|' || strftime(d, '%Y-%m-%d') || '|$suffix'), 1, 15) AS UBIGINT) AS BIGINT)"
    s"""WITH days AS (
       |  SELECT unnest(generate_series(DATE '2024-02-01', DATE '2024-03-31',
       |    INTERVAL 1 DAY)) AS d),
       |sym AS (SELECT unnest(['AAPL', 'MSFT', 'GOOG']) AS s),
       |b AS (
       |  SELECT s AS symbol, CAST(d AS TIMESTAMP) AS ts,
       |    50.0 + (${h("o")} % 10000) / 100.0 AS o,
       |    50.0 + (${h("c")} % 10000) / 100.0 AS c,
       |    (${h("h")} % 1000) / 100.0 AS dh,
       |    (${h("l")} % 1000) / 100.0 AS dl,
       |    1000 + ${h("v")} % 9000 AS volume
       |  FROM sym, days)
       |SELECT symbol, CAST(month(ts) AS INTEGER) AS m, count(*) AS n_bars,
       |  round(sum(c), 4) AS sum_close,
       |  round(min(least(o, c) - dl), 4) AS min_low,
       |  round(max(greatest(o, c) + dh), 4) AS max_high,
       |  CAST(sum(volume) AS BIGINT) AS sum_volume
       |FROM b GROUP BY 1, 2 ORDER BY symbol, m""".stripMargin
  }
}
