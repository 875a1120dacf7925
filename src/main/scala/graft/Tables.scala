package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet fixture tables (TESTDATA.md).
  *
  * Every table is a plain parquet file `{dir}/{name}.parquet`. Loads are
  * declarative `spark.read.parquet` scans so Catalyst column pruning and
  * predicate pushdown reach the parquet reader — callers should
  * select/filter directly on the returned DataFrame and let the optimizer
  * prune the scan (verified via `.explain`: `ReadSchema`/`PushedFilters`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` has shipped with two `ts` physical types across
    * fixture generations, so the loader adapts to what the file
    * actually stores instead of assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark's parquet reader rejects it outright
    *    unless `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it
    *    as a raw nanos Long (GraftSession/Verify/SparkSuite all set
    *    it).  Truncate to micros with integer division — exactly
    *    DuckDB's nanos→micros truncation; float division would lose
    *    precision above 2^53 ns.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; reinterpret the wall-clock as UTC (sessions run
    *    with session.timeZone=UTC) so downstream sees the same
    *    TimestampType instants as the nanos path produced.
    *
    * Either way callers get `ts: TimestampType` at micros precision. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try load(s, d, "events")
      catch {
        case e: Exception if Option(e.getMessage).exists(_.contains("NANOS")) =>
          throw new IllegalStateException(
            "events.parquet stores TIMESTAMP(NANOS) - the session must set " +
              "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.build does)", e)
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
