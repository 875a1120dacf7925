package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale layout patterns, exercised and plan-verified in
  * ScalePatternsSpec:
  *
  *  - **Bucketed co-located joins**: writing both fact tables bucketed
  *    on the join key lets repeated joins run with ZERO shuffle — the
  *    bucket layout is the shuffle, paid once at write time.  On a
  *    100 TB star schema this turns every orders⋈lineitem from a
  *    full-table exchange into a local zip of bucket files.
  *
  *  - **Salted aggregation**: two-phase aggregation over a synthetic
  *    salt for heavy-hitter keys.  AQE's skew-join handling covers
  *    joins; aggregation skew (one key ≫ others) still needs salting
  *    when a single reducer would own the hot key.  Partial map-side
  *    aggregation usually absorbs this for algebraic aggregates; the
  *    explicit pattern matters for holistic ones (collect_list etc.).
  */
object ScalePatterns {

  /** Write `df` bucketed (+ sorted) by `keys` as a managed parquet
    * table — the layout that makes future joins on `keys` shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys; with matching
    * bucket counts the plan has no Exchange on either side. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Two-phase salted aggregation: count + sum of `valueCol` per
    * `key`, partial-aggregated over (key, salt) first so no single
    * reducer owns a hot key. Result is exactly groupBy(key).agg(...). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    df
      // content-derived salt: hashing EVERY column keeps the salt a
      // deterministic function of the row, so a stage retry after a
      // fetch failure re-assigns identical salts and the partial
      // aggregates stay exact (a monotonically_increasing_id salt can
      // shift across attempts — SPARK-23207 class of bugs).  Spread is
      // still guaranteed for the common skew shape: identical duplicate
      // rows that collapse onto one salt are exactly the rows map-side
      // partial aggregation combines for free
      .withColumn("__salt",
        pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$valueCol"))
  }

  /** Salted aggregation as an oracle-checked query: l_returnflag has
    * only 3 values, so a plain groupBy funnels 600 k rows into 3
    * reducers — the textbook aggregation-skew shape.  The salted
    * two-phase form spreads each hot key over 16 sub-keys and must
    * produce EXACTLY the plain aggregate (l_quantity is integral, so
    * the double sums are order-independent); the oracle is the plain
    * single-phase GROUP BY. */
  def qSaltedAgg(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame = {
    import spark.implicits._
    saltedSumCount(
      graft.Tables.lineitem(spark, dir).select($"l_returnflag", $"l_quantity"),
      "l_returnflag", "l_quantity", salts = 16)
      .select($"l_returnflag", $"n",
        round($"sum_l_quantity", 2).as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  def qSaltedAggOracleSql: String =
    """SELECT l_returnflag, count(*) AS n,
      | round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
