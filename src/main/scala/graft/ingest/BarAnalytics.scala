package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Bar-domain analytics extending the reference's ingestion surface
  * (its bars stop at one timeframe and a min/max/count summary —
  * `app/alpaca_service.py:237-258`): multi-timeframe resampling and
  * the return/volatility/drawdown roll-up every consumer of OHLCV
  * bars computes next.
  *
  * Both operators are written as ONE SQL text valid in Spark SQL and
  * DuckDB verbatim (`min_by`/`max_by`, ISO `date_trunc('week')`,
  * window frames, and explicit Σ/Σ² variance are identical in both),
  * so the engine runs the very string the oracle checks — no dialect
  * fork to drift.
  *
  * Scale shapes: weekly resample is one map-side-combining aggregate
  * over the (already aggregated) daily bars; the analytics query is
  * one window pass partitioned by symbol (lag + running max in a
  * single frame-bounded Window) then a per-symbol aggregate — no
  * all-history state, no self-join. */
object BarAnalytics {

  /** Daily-bar CTE shared with the `ingest_bars_daily` oracle. */
  private val dailyCte =
    """b AS (
      |  SELECT event_type AS symbol,
      |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
      |    min_by(value, ts) AS o, max(value) AS h, min(value) AS l,
      |    max_by(value, ts) AS c, count(*) AS v
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)""".stripMargin

  /** Bar→bar resample to ISO weeks: open = first day's open, close =
    * last day's close, high/low = extrema, volume = sum. */
  val weeklySql: String =
    s"""WITH $dailyCte
       |SELECT symbol,
       |  CAST(date_trunc('week', t) AS TIMESTAMP) AS week_start,
       |  min_by(o, t) AS open, max(h) AS high, min(l) AS low,
       |  max_by(c, t) AS close,
       |  CAST(sum(v) AS BIGINT) AS volume,
       |  count(*) AS n_days
       |FROM b GROUP BY 1, 2
       |ORDER BY symbol, week_start""".stripMargin

  /** Per-symbol daily-close analytics: simple-return mean, sample
    * volatility from explicit Σ/Σ² (guarded against tiny-negative
    * variance), and maximum drawdown off the running close maximum. */
  val analyticsSql: String =
    s"""WITH $dailyCte,
       |r AS (
       |  SELECT symbol, t, c,
       |    lag(c) OVER (PARTITION BY symbol ORDER BY t) AS pc,
       |    max(c) OVER (PARTITION BY symbol ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
       |  FROM b),
       |x AS (
       |  SELECT symbol, c / pc - 1 AS ret, c / runmax - 1 AS dd FROM r),
       |s AS (
       |  SELECT symbol, count(ret) AS n_rets,
       |    sum(ret) AS s1, sum(ret * ret) AS s2, min(dd) AS mdd
       |  FROM x GROUP BY symbol)
       |SELECT symbol, CAST(n_rets AS BIGINT) AS n_rets,
       |  CASE WHEN n_rets > 0 THEN round(s1 / n_rets, 6) ELSE NULL END
       |    AS mean_ret,
       |  CASE WHEN n_rets > 1 THEN
       |    round(sqrt(greatest((s2 - s1 * s1 / n_rets) / (n_rets - 1),
       |      CAST(0.0 AS DOUBLE))), 6)
       |  ELSE NULL END AS volatility,
       |  round(mdd, 6) AS max_drawdown
       |FROM s ORDER BY symbol""".stripMargin

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(sql)
  }

  def weeklyBars(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, weeklySql)
  def analytics(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, analyticsSql)

  /** Per-symbol market beta/alpha/correlation against the equal-weight
    * market return (the cross-symbol mean of each day's simple
    * returns) — the covariance analytics a bar platform publishes
    * next to volatility and drawdown.  Closed-form least squares from
    * the five sufficient sums (n, Σx, Σy, Σxy, Σx²): one window pass
    * for returns, one per-day mean, one per-symbol aggregate.  Like
    * `analyticsSql`, ONE SQL text valid verbatim in Spark and DuckDB.
    *
    * Determinism: returns are quantized to integer 10⁻⁴ units
    * (BIGINT) before ANY cross-row sum — the sufficient statistics
    * are exact integer sums, associative and commutative, so
    * partial-aggregation order cannot shift a beta across a
    * round(…, 6) boundary (the discipline the PCA and LM scorers
    * follow).  Beta and correlation are scale-free ratios of q²
    * quantities — the quantization factor cancels; alpha de-scales
    * once at the end.
    *
    * Int64 budget (the events fixture's `value` column is NOT
    * price-like — daily "returns" reach 10³): with Q = 10⁴ and
    * |ret| ≤ ~10³, per-row squares are ≤ 10¹⁴ and the per-symbol
    * sums stay orders of magnitude inside int64 at any realistic
    * day depth.  The closed-form combinations (n·Σxx − Σx², …) are
    * single IEEE multiplications of exact-integer doubles — still
    * deterministic, and immune to the BIGINT·BIGINT overflow that
    * n·Σyy would hit (DuckDB errors on it; Spark would wrap
    * silently).
    *
    * Degenerate guards: symbols with < 2 matched days or a
    * zero-variance market leg yield NULL beta/alpha/corr rather than
    * a division blow-up.
    *
    * Scale: returns partition by symbol (dim-cardinality windows),
    * the market leg is a per-day aggregate broadcast back by date —
    * no fact-fact shuffle beyond the daily-bar rollup all bar
    * analytics share. */
  val betaSql: String =
    s"""WITH $dailyCte,
       |r AS (
       |  SELECT symbol, t, c,
       |    lag(c) OVER (PARTITION BY symbol ORDER BY t) AS pc
       |  FROM b),
       |x AS (
       |  SELECT symbol, t,
       |    CAST(round((c / pc - 1) * 10000.0) AS BIGINT) AS rq
       |  FROM r WHERE pc IS NOT NULL),
       |m AS (
       |  SELECT t,
       |    CAST(round(CAST(sum(rq) AS DOUBLE) / count(*)) AS BIGINT) AS mq
       |  FROM x GROUP BY t),
       |j AS (
       |  SELECT x.symbol, x.rq AS yq, m.mq AS xq FROM x
       |  JOIN m ON m.t = x.t),
       |s AS (
       |  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(yq) AS BIGINT) AS sy, CAST(sum(xq) AS BIGINT) AS sx,
       |    CAST(sum(yq * xq) AS BIGINT) AS sxy,
       |    CAST(sum(xq * xq) AS BIGINT) AS sxx,
       |    CAST(sum(yq * yq) AS BIGINT) AS syy
       |  FROM j GROUP BY symbol),
       |f AS (
       |  SELECT symbol, n, sy, sx,
       |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
       |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
       |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
       |  FROM s)
       |SELECT symbol, n AS n_days,
       |  CASE WHEN n > 1 AND varx > 0
       |    THEN round(cov_n / varx, 6)
       |    ELSE NULL END AS beta,
       |  CASE WHEN n > 1 AND varx > 0
       |    THEN round((CAST(sy AS DOUBLE) / n
       |      - (cov_n / varx) * (CAST(sx AS DOUBLE) / n)) / 10000.0, 6)
       |    ELSE NULL END AS alpha,
       |  CASE WHEN n > 1 AND varx > 0 AND vary > 0
       |    THEN round(cov_n / sqrt(varx * vary), 6)
       |    ELSE NULL END AS mkt_corr
       |FROM f ORDER BY symbol""".stripMargin

  def beta(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, betaSql)
}
