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
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; read the nanos as Long and truncate to micros with
    * integer division (exactly DuckDB's nanos→micros truncation —
    * float division would lose precision above 2^53 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must set spark.sql.legacy.parquet.nanosAsLong=true " +
        "(GraftSession.build does) - events.parquet is TIMESTAMP(NANOS)")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
