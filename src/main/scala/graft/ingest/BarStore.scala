package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S4: keyed idempotent upsert sink, without Delta (SURVEY.md §7.3).
  *
  * The reference upserts each bar under a deterministic composite doc
  * id with merge=True, making re-runs no-ops (`app/alpaca_service.py:
  * 183-230`).  The Spark-native equivalent: dedup on the logical key,
  * then dynamic-partition-overwrite parquet partitioned by bar date —
  * re-ingesting a trailing window rewrites exactly the touched date
  * partitions and leaves the rest of the table alone.
  *
  * Scale design: the table is partitioned by `bar_date` (and the data
  * within by symbol via the repartition), so a 30-day trailing
  * re-ingest over years of history touches 30 partitions regardless of
  * total table size; readers get partition pruning on date predicates
  * for free.  `repartition(bar_date)` keeps one writer task per date
  * partition — no small-file explosion from N tasks × M partitions.
  */
object BarStore {
  val key: Seq[String] = Seq("symbol", "bar_key")

  def upsert(bars: DataFrame, path: String): Unit = {
    val spark = bars.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      bars
        .dropDuplicates(key)
        .withColumn("bar_date", to_date(col("timestamp")))
        .repartition(col("bar_date"))
        .write
        .partitionBy("bar_date")
        .mode(SaveMode.Overwrite)
        .parquet(path)
    } finally prev.foreach(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
