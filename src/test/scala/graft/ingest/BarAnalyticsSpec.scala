package graft.ingest

import graft.SparkSuite

/** Weekly resample and return analytics recomputed independently in
  * Scala from the daily canonical bars. */
class BarAnalyticsSpec extends SparkSuite {

  private def daily() = BarPipeline.canonicalBars(spark, sf())
    .selectExpr("symbol", "timestamp AS t", "open", "high", "low",
      "close", "volume")
    .collect()
    .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))

  test("weekly bars aggregate the daily bars OHLC-correctly") {
    val byWeek = daily().groupBy { case (sym, t, _, _, _, _, _) =>
      (sym, t.toLocalDateTime.toLocalDate
        .`with`(java.time.DayOfWeek.MONDAY))
    }
    val expected = byWeek.map { case ((sym, wk), g) =>
      val sorted = g.sortBy(_._2.getTime)
      (sym, java.sql.Timestamp.valueOf(wk.atStartOfDay),
        sorted.head._3, g.map(_._4).max, g.map(_._5).min,
        sorted.last._6, g.map(_._7).sum, g.length.toLong)
    }.toSet
    val got = BarAnalytics.weeklyBars(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
      .toSet
    assert(got == expected)
  }

  test("return analytics match a Scala recomputation per symbol") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = daily().groupBy(_._1).map { case (sym, g) =>
      val closes = g.sortBy(_._2.getTime).map(_._6)
      val rets = closes.sliding(2).map(p => p(1) / p(0) - 1).toSeq
      val n = rets.length
      val (s1, s2) = (rets.sum, rets.map(x => x * x).sum)
      val vol = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1), 0.0))
      val dd = closes.scanLeft(Double.MinValue)(math.max).tail
        .zip(closes).map { case (mx, c) => c / mx - 1 }.min
      (sym, n.toLong, r6(s1 / n), r6(vol), r6(dd))
    }.toSet
    val got = BarAnalytics.analytics(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == expected)
    // drawdowns are non-positive by construction
    assert(got.forall(_._5 <= 0.0))
  }

  test("degenerate symbols (one or two bars) yield NULL, not 0/0") {
    import java.sql.Timestamp
    import spark.implicits._
    // ONE1 has a single bar (zero returns); TWO2 has two bars (one
    // return, so sample variance's n-1 denominator is zero).  Both
    // divisions must be CASE-guarded to NULL so Spark (non-ANSI NULL)
    // and DuckDB (NaN/inf doubles) agree on the same SQL text.
    Seq(
      ("ONE1", Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
      ("TWO2", Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
      ("TWO2", Timestamp.valueOf("2024-01-02 10:00:00"), 12.0))
      .toDF("event_type", "ts", "value")
      .createOrReplaceTempView("events")
    val rows = spark.sql(BarAnalytics.analyticsSql).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(rows("ONE1") == ((0L, true, true)),
      "zero returns: mean and volatility both NULL")
    assert(rows("TWO2")._1 == 1L && !rows("TWO2")._2 && rows("TWO2")._3,
      "one return: mean defined, volatility NULL")
  }

  test("market beta matches a Scala least-squares recomputation") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-symbol daily returns, quantized exactly like the SQL (1e-4)
    val rets = daily().groupBy(_._1).flatMap { case (sym, g) =>
      g.sortBy(_._2.getTime).toSeq.sliding(2).collect {
        case Seq(a, b) =>
          (sym, b._2, math.round((b._6 / a._6 - 1) * 1e4))
      }
    }.toSeq
    val mkt = rets.groupBy(_._2).view
      .mapValues(g => math.round(g.map(_._3).sum.toDouble / g.length))
      .toMap
    val expected = rets.groupBy(_._1).map { case (sym, g) =>
      val xs = g.map(p => mkt(p._2))
      val ys = g.map(_._3)
      val n = g.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      // the SQL's closed forms: single multiplications of
      // exact-integer doubles
      val covN = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val varx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val vary = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      val beta = covN / varx
      (sym, n, r6(beta),
        r6((sy.toDouble / n - beta * (sx.toDouble / n)) / 1e4),
        r6(covN / math.sqrt(varx * vary)))
    }.toSet
    val got = BarAnalytics.beta(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == expected)
    // correlations are bounded and the market leg is shared: a
    // 5-symbol equal-weight market gives every symbol positive weight
    assert(got.forall(t => t._5 >= -1.0 && t._5 <= 1.0))
  }
}
