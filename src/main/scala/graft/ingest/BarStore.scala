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

  /** S3: idempotent seed/bootstrap writer — create the table only when
    * absent, a no-op otherwise (the reference checks `get().exists`
    * before `set`, `scripts/seed_firestore.py:17-44`; SaveMode.Ignore
    * is the Spark-native equivalent). */
  def seed(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Ignore).parquet(path)

  /** Key-level MERGE for incremental/streaming updates: a batch that
    * carries only some keys of a date partition must not clobber the
    * rest of that partition.  Pattern: read back only the touched date
    * partitions (partition pruning — bounded work however large the
    * table), union with the new batch, keep the newest version of each
    * key, rewrite just those partitions via dynamic overwrite.
    * `localCheckpoint` truncates the read lineage so Spark permits
    * overwriting the path being read.  (A transactional table format
    * would do this natively; this is the no-Delta equivalent,
    * SURVEY.md §7.3.) */
  def merge(bars: DataFrame, path: String): Unit = {
    val spark = bars.sparkSession
    val dated = bars.dropDuplicates(key)
      .withColumn("bar_date", to_date(col("timestamp")))
    // Resolve through Hadoop's FileSystem — java.io.File is always
    // false for non-local URIs (hdfs://, s3a://), which would silently
    // degrade every merge to a key-clobbering upsert on such storage.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) { upsert(bars, path); return }
    val touched = dated.select("bar_date").distinct()
      .collect().map(_.getDate(0)) // small: one row per touched date
    val existing = read(spark, path)
      .filter(col("bar_date").isin(touched.toIndexedSeq: _*))
      .localCheckpoint(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      dated.withColumn("pri", lit(1))
        .unionByName(existing.withColumn("pri", lit(0))
          .select(dated.columns.map(col).toIndexedSeq :+ col("pri"): _*))
        .groupBy(key.map(col).toIndexedSeq: _*)
        .agg(max_by(struct((dated.columns.filterNot(key.contains))
          .map(col).toIndexedSeq: _*), col("pri")).as("r"))
        .select(dated.columns.toIndexedSeq.map(c =>
          if (key.contains(c)) col(c) else col(s"r.$c").as(c)): _*)
        .repartition(col("bar_date"))
        .write.partitionBy("bar_date").mode(SaveMode.Overwrite).parquet(path)
    } finally prev.foreach(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }
}
