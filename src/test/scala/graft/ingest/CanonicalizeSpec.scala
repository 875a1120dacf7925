package graft.ingest

import java.sql.Timestamp
import graft.SparkSuite

/** Drift-tolerance behaviors from FIXTURES.md §A3: extra columns pruned,
  * missing optional columns tolerated, missing timestamp → reject,
  * empty input → empty output. */
class CanonicalizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("extra columns are pruned, canonical schema fixed") {
    val raw = Seq(
      ("SPY", ts("2024-01-02 10:00:00"), 1.0, 2.0, 0.5, 1.5, 100L, 7L, 1.23))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume", "trade_count", "vwap")
    val out = Canonicalize.canonicalize(raw, "Day").get
    assert(out.columns.toSeq === Seq("bar_key", "symbol", "timestamp",
      "timeframe", "open", "high", "low", "close", "volume"))
    val row = out.collect().head
    assert(row.getAs[String]("bar_key") === "20240102T100000Z_Day")
    assert(row.getAs[Double]("open") === 1.0)
    assert(row.getAs[Long]("volume") === 100L)
  }

  test("missing optional columns become nulls; rename is conditional") {
    val raw = Seq(("SPY", ts("2024-01-02 10:00:00"), 1.0))
      .toDF("symbol", "timestamp", "close")
    val out = Canonicalize.canonicalize(raw, "Hour").get
    val row = out.collect().head
    assert(row.getAs[Any]("open") == null)
    assert(row.getAs[Double]("close") === 1.0)
    assert(row.getAs[String]("timeframe") === "Hour")
  }

  test("missing timestamp column rejects the whole input (P6)") {
    val raw = Seq(("SPY", 1.0)).toDF("symbol", "close")
    assert(Canonicalize.canonicalize(raw, "Day").isEmpty)
  }

  test("null-timestamp rows are dropped, not crashed on") {
    val raw = Seq(
      ("SPY", Option(ts("2024-01-02 10:00:00")), 1.0),
      ("SPY", Option.empty[Timestamp], 2.0))
      .toDF("symbol", "timestamp", "close")
    assert(Canonicalize.canonicalize(raw, "Day").get.count() === 1)
  }

  test("empty input yields empty canonical output (P7)") {
    val raw = Seq.empty[(String, Timestamp, Double)]
      .toDF("symbol", "timestamp", "close")
    assert(Canonicalize.canonicalize(raw, "Day").get.count() === 0)
  }

  test("ISO string formatting (F2)") {
    val raw = Seq(("SPY", ts("2024-01-02 10:00:00"), 1.0))
      .toDF("symbol", "timestamp", "close")
    val out = Canonicalize.isoString(Canonicalize.canonicalize(raw, "Day").get)
    assert(out.collect().head.getAs[String]("t_str_iso")
      === "2024-01-02T10:00:00Z")
  }
}
