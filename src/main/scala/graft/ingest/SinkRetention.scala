package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Age-gated retention for the append-only side sinks (event-summary
  * JSON, quarantine parquet): under streaming these accumulate one
  * batch of files per trigger forever — unlike the bar store, whose
  * r9 retention/compaction lifecycle covers only `bar_date=`
  * partitioned bar tables.
  *
  * The move is `BarStore.vacuum`'s: partition the sink by a capture
  * date at write time (`appendDated` stamps `sink_date` — a SINK-
  * BOUNDARY server timestamp, the F7 pattern; retention is an
  * operational property of when rows landed, not of event time), then
  * drop whole partitions strictly older than the horizon.  Dropping a
  * directory is atomic from a reader's perspective in the same sense
  * as the bar-store vacuum: a pruned reader (`sink_date >= horizon`)
  * never lists the dropped dirs; an unpruned reader racing the vacuum
  * sees an old or a new listing of each partition, never a partial
  * file set (file-level deletes happen inside a dir that pruned
  * readers no longer visit, and whole-partition removal is one
  * recursive delete of a dir no longer listed).
  *
  * These sinks are written via `foreachBatch` appends (no streaming
  * file-sink `_spark_metadata` log), so directory listing IS the read
  * path and partition drops cannot orphan a manifest.  At-least-once
  * appends carry `batch_id` for downstream dedup; the quarantine is a
  * monitoring copy, where duplicate rows are benign and silent loss
  * is not. */
object SinkRetention {

  val DateCol = "sink_date"

  private val PartRx = s"^$DateCol=(\\d{4}-\\d{2}-\\d{2})$$".r

  /** Append `df` to `path` partitioned by the capture date.
    *
    * Fails fast if the target carries a streaming file-sink
    * `_spark_metadata` log (a sink written by an older deployment's
    * `format("parquet").writeStream`): Spark resolves reads of such a
    * directory THROUGH the manifest, so rows appended here would be
    * invisible to every reader and aged out by no one — silent loss
    * disguised as an empty query.  The one-line migration is to move
    * the legacy files aside (or delete the `_spark_metadata` dir
    * after confirming its files are re-ingested).  One `exists` call
    * per append — noise next to the write job it guards. */
  def appendDated(df: DataFrame, path: String,
                  format: String = "parquet"): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_spark_metadata")
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    require(!fs.exists(p),
      s"$path carries a streaming file-sink _spark_metadata log; " +
        "rows appended outside the manifest would be invisible to " +
        "readers. Migrate the legacy sink (move its files aside or " +
        "remove _spark_metadata after re-ingesting) before appending.")
    df.withColumn(DateCol, current_date())
      .write.mode(SaveMode.Append).partitionBy(DateCol)
      .format(format).save(path)
  }

  /** Drop `sink_date=` partitions strictly older than `olderThan`.
    * Returns the dropped partition names; absent paths and foreign
    * (non-dated) directories are left untouched. */
  def vacuum(spark: SparkSession, path: String,
             olderThan: java.sql.Date): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    Option(fs.listStatus(p)).getOrElse(Array.empty).toSeq
      .filter(_.isDirectory)
      .flatMap { d =>
        PartRx.findFirstMatchIn(d.getPath.getName).flatMap { m =>
          val dt = java.sql.Date.valueOf(m.group(1))
          if (dt.before(olderThan)) {
            fs.delete(d.getPath, true)
            Some(d.getPath.getName)
          } else None
        }
      }
      .sorted
  }
}
