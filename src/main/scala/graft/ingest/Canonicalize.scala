package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bar canonicalization (SURVEY.md §2.2-2.3: P1-P7, F1-F4, and the
  * schema-convergence behavior of §1.3).
  *
  * The reference tolerates upstream schema drift (rename only columns
  * that exist, keep only wanted columns that survived, skip data whose
  * timestamp is missing) and converges to one fixed canonical schema:
  * `{bar_key, symbol, timestamp, timeframe, open, high, low, close,
  * volume}`.  Reference: `app/alpaca_service.py:138-164,194-206`.
  *
  * All steps are pure `Column` expressions — whole-stage-codegen'd, no
  * UDFs — so the transform fuses with the surrounding scan/shuffle at
  * any scale.
  */
object Canonicalize {

  /** Upstream→short-name rename map (ref `:139-143`). */
  val renames: Map[String, String] = Map(
    "timestamp" -> "t", "open" -> "o", "high" -> "h",
    "low" -> "l", "close" -> "c", "volume" -> "v")

  private val wanted = Seq("t", "o", "h", "l", "c", "v")

  /** P2: conditional rename — applied only to columns present. */
  def conditionalRename(df: DataFrame): DataFrame =
    renames.filter { case (from, _) => df.columns.contains(from) }
      .foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** P3: keep wanted ∩ existing (extras like trade_count/vwap pruned). */
  def pruneColumns(df: DataFrame): DataFrame = {
    val keep = df.columns.filter(c => wanted.contains(c) || c == "symbol")
    df.select(keep.map(col).toIndexedSeq: _*)
  }

  /** P6: required-column guard — the whole input is rejected when the
    * timestamp column is absent after rename (reference skips the asset
    * rather than crashing, `:146-151`). */
  def hasTimestamp(df: DataFrame): Boolean = df.columns.contains("t")

  /** Full canonicalization: rename → guard → prune → cast → UTC
    * timestamp → key synthesis.  Returns None when the timestamp column
    * is missing (the caller quarantines the source, T7). */
  def canonicalize(raw: DataFrame, timeframe: String): Option[DataFrame] = {
    val renamed = conditionalRename(raw)
    if (!hasTimestamp(renamed)) None
    else Some {
      val pruned = pruneColumns(renamed)
      val withMissing = wanted.filterNot(pruned.columns.contains)
        .foldLeft(pruned)((d, c) => d.withColumn(c, lit(null)))
      withMissing
        // P5-analog: rows with a null timestamp can't form a key — drop.
        .filter(col("t").isNotNull)
        .select(
          // F3: deterministic upsert key (ref :194)
          concat(date_format(col("t"), "yyyyMMdd'T'HHmmss'Z'"),
            lit("_"), lit(timeframe)).as("bar_key"),
          col("symbol").cast("string").as("symbol"),
          // F1: parse + UTC normalize (session TZ pinned UTC)
          col("t").cast("timestamp").as("timestamp"),
          lit(timeframe).as("timeframe"),
          // F4: explicit numeric casts (ref :200-204)
          col("o").cast("double").as("open"),
          col("h").cast("double").as("high"),
          col("l").cast("double").as("low"),
          col("c").cast("double").as("close"),
          col("v").cast("long").as("volume"))
    }
  }

  /** F7: server-side write timestamp (`updated_at:
    * firestore.SERVER_TIMESTAMP`, ref :205) — applied at the sink
    * boundary, deliberately NOT in the canonical schema so the T3
    * idempotence property ("re-runs are no-ops modulo updated_at")
    * stays testable on the data columns, exactly like the reference. */
  def withServerTimestamp(df: DataFrame): DataFrame =
    df.withColumn("updated_at", current_timestamp())

  /** F2: ISO-8601 string form of a bar timestamp (ref :162). */
  def isoString(df: DataFrame): DataFrame =
    df.withColumn("t_str_iso",
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
}
