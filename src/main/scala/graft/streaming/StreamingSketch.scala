package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.{SparkDialect, TextFilters}

/** Online maintenance of a Count-Min frequency sketch from a document
  * stream — the streaming face of `TextFilters.heavyHittersSql`.
  *
  * This is the operator that exists BECAUSE the sketch is mergeable:
  * each micro-batch folds to a ≤ depth×width partial (constant size
  * regardless of batch volume), partials written per batch are summed
  * cell-wise at serve time, and cell-wise BIGINT addition is
  * associative + commutative — so the merged sketch over any split of
  * the corpus is bit-identical to the one-pass batch sketch
  * (spec-pinned).  That is exactly the property that lets a
  * 1000-executor cluster sketch a 100 TB token stream with 256 longs
  * of state per partition and no vocabulary-sized GROUP BY anywhere.
  *
  * Store layout: one parquet file of (r, bkt, c) partial cells per
  * write attempt under `batch=<id>/attempt=<nanos>/` — APPEND-ONLY: a
  * crash-replayed batch writes a fresh attempt directory and never
  * deletes the previous one (an overwrite would be delete-then-write,
  * opening a window where a concurrent merge silently reads the batch
  * as zero cells).  The fold is deterministic per batch, so every
  * complete attempt of a batch carries identical cells; merge-time
  * dedup keeps exactly one attempt per batch (the smallest attempt id
  * that has rows — attempt ids increase in time, so an attempt that is
  * still being written can only be the LARGEST, and with one coalesced
  * file per attempt its cells appear atomically at commit).  Readers
  * therefore always see complete partials, with no reliance on
  * overwrite atomicity.
  *
  * The bucket hash is `TextFilters.cmBucket` — the same definition
  * the batch relation and the DuckDB oracle use, so an estimate
  * served from the streamed store can be cross-checked against the
  * oracle-verified batch query (the spec does). */
object StreamingSketch {

  /** Constant-size partial sketch of one (streaming micro-)batch:
    * (r, bkt, c) over `TextFilters.CmDepth` rows.  Map-side combine
    * reduces every partition to ≤ depth·width cells before the final
    * shuffle, whatever the batch size. */
  def cmPartial(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val d = SparkDialect
    docs
      .selectExpr(s"${d.explode(d.tokens("text"))} AS token")
      .selectExpr("token",
        s"${d.explode(d.sequence0(TextFilters.CmDepth.toString))} AS r")
      .selectExpr("r", s"${TextFilters.cmBucket(d, "token", "r")} AS bkt")
      .groupBy("r", "bkt")
      .agg(count(lit(1)).cast("long").as("c"))
  }

  /** Maintain the sketch store from a document stream. */
  def start(docs: DataFrame, storePath: String,
            trigger: Trigger = Trigger.ProcessingTime(0),
            checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch, storePath, id)
      }
      .trigger(trigger)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** One batch's fold into the store — public so specs (and batch
    * backfills) can drive the same code path the stream runs.  Each
    * call writes a FRESH `attempt=` directory (append-only — see the
    * object doc for why overwrite is unsafe under concurrent reads). */
  def appendBatch(batch: DataFrame, storePath: String, id: Long): Unit =
    cmPartial(batch)
      .coalesce(1) // ≤ depth·width rows — one tiny file per attempt
      .write.parquet(s"$storePath/batch=$id/attempt=${System.nanoTime()}")

  /** Read a partial store, keeping ONE attempt per batch (smallest
    * attempt id with rows — deterministic partials make all complete
    * attempts identical, so any single complete pick is correct).
    * `None` when the store has no committed batch yet — a stream that
    * started but produced nothing must read as empty, not throw. */
  private def dedupedCells(spark: SparkSession, storePath: String,
      valueCols: Seq[String]): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    if (!hasBatch) None
    else
      // a racing FIRST write can expose `batch=/attempt=` dirs whose
      // data file hasn't committed yet: with zero parquet files in the
      // whole store, schema inference throws — that reader must see an
      // empty store, not an error (the committed-file state it races)
      try {
        val cells = spark.read.parquet(storePath)
        val chosen = cells.groupBy("batch")
          .agg(min("attempt").as("attempt"))
        Some(cells.join(chosen, Seq("batch", "attempt"))
          .select(valueCols.map(col): _*))
      } catch {
        // ONLY the no-committed-file race reads as empty — any other
        // analysis failure (schema drift in a corrupted store, a
        // renamed column) must surface as the error it is, or a
        // monitoring sketch reports "no heavy hitters" for a broken
        // store
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
      }
  }

  /** The merged sketch: cell-wise sum of one attempt per batch.
    * Empty (0 cells) when the store holds no committed batch yet. */
  def mergedSketch(spark: SparkSession, storePath: String): DataFrame =
    dedupedCells(spark, storePath, Seq("r", "bkt", "c")) match {
      case Some(cells) => cells.groupBy("r", "bkt").agg(sum("c").as("c"))
      case None =>
        spark.range(0).selectExpr("CAST(id AS INT) AS r",
          "CAST(id AS BIGINT) AS bkt", "CAST(id AS BIGINT) AS c")
    }

  /** Fixed-range equi-width histogram partial of one batch — the
    * quantile counterpart of `cmPartial`, the streaming face of
    * `RelationalExt.histQuantilesSql`.  The range [lo, hi] is FIXED
    * a priori (values outside clamp into the edge bins): a data-
    * derived range would make partials from different batches
    * non-mergeable, which is exactly why production histograms pin
    * the range — the one-pass min/max the batch relation affords is
    * a luxury a stream doesn't have. */
  def histPartial(vals: DataFrame, col: String,
                  lo: Double, hi: Double, bins: Int): DataFrame = {
    val w = s"((${hi}D - ${lo}D) / ${bins}D)"
    vals
      // a NULL value carries no quantile information — and unfiltered
      // it would bin to NULL, which a reader would misparse as bin 0
      .where(s"$col IS NOT NULL")
      .selectExpr(
        s"CAST(greatest(least(floor(($col - ${lo}D) / $w), ${bins - 1}), 0)" +
          " AS BIGINT) AS bin")
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("c"))
  }

  /** Maintain a histogram store from a value stream (same append-only
    * attempt contract as the CM store — replay-idempotent). */
  def startHist(vals: DataFrame, col: String, storePath: String,
                lo: Double, hi: Double, bins: Int = 128,
                trigger: Trigger = Trigger.ProcessingTime(0),
                checkpoint: Option[String] = None): StreamingQuery = {
    val w = vals.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendHistBatch(batch, col, storePath, id, lo, hi, bins)
      }
      .trigger(trigger)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  def appendHistBatch(batch: DataFrame, col: String, storePath: String,
                      id: Long, lo: Double, hi: Double, bins: Int): Unit =
    histPartial(batch, col, lo, hi, bins)
      .coalesce(1)
      .write.parquet(s"$storePath/batch=$id/attempt=${System.nanoTime()}")

  /** Cell-wise-merged histogram over one attempt per batch.  Empty
    * when the store holds no committed batch yet. */
  def mergedHist(spark: SparkSession, storePath: String): DataFrame =
    dedupedCells(spark, storePath, Seq("bin", "c")) match {
      case Some(cells) => cells.groupBy("bin").agg(sum("c").as("c"))
      case None => spark.range(0)
        .selectExpr("CAST(id AS BIGINT) AS bin", "CAST(id AS BIGINT) AS c")
    }

  /** Quantile estimates from the streamed histogram store, by the
    * same inverse-interpolation as the batch relation: target rank
    * p·(n−1)+1, first bin whose cumulative count reaches it, linear
    * within the bin.  The ≤ bins cells collect to the driver — the
    * whole point of the sketch is that this state is constant-size.
    * Returns (p, est) pairs; accuracy is the batch relation's
    * verified one-bin-width dense-case contract (see
    * `RelationalExt.histQuantilesSql`).  An EMPTY store (no values
    * folded yet) returns Seq.empty — there is no quantile of nothing,
    * and fabricating one would hand the caller a confident-looking
    * number. */
  def estimateQuantiles(spark: SparkSession, storePath: String,
                        lo: Double, hi: Double, bins: Int,
                        ps: Seq[Double]): Seq[(Double, Double)] = {
    val cells = mergedHist(spark, storePath).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("c"))
      .sortBy(_._1)
    val n = cells.map(_._2).sum
    if (n == 0) return Seq.empty
    val w = (hi - lo) / bins
    ps.map { p =>
      val tgt = p * (n - 1) + 1
      var cum = 0L
      var hit: Option[(Long, Long, Long)] = None // (bin, prevCum, c)
      for ((b, bc) <- cells if hit.isEmpty) {
        cum += bc
        if (cum >= tgt) hit = Some((b, cum - bc, bc))
      }
      // n ≥ 1 and tgt ≤ n = final cum, so hit is always defined
      val (bin, prevCum, c) = hit.get
      p -> (lo + (bin + (tgt - prevCum) / c.toDouble) * w)
    }
  }

  /** Point estimates from the streamed store for the given tokens:
    * min over sketch rows of the token's bucket cell — the same
    * arithmetic as the batch relation's `cm_est` column.  Tokens
    * whose every bucket is absent from the store estimate 0 (an empty
    * CM cell is a zero counter, not a NULL). */
  def estimate(spark: SparkSession, storePath: String,
               tokens: Seq[String]): DataFrame = {
    val d = SparkDialect
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val probes = tokens.toDF("token")
      .selectExpr("token",
        s"${d.explode(d.sequence0(TextFilters.CmDepth.toString))} AS r")
      .selectExpr("token", "r",
        s"${TextFilters.cmBucket(d, "token", "r")} AS bkt")
    probes
      .join(mergedSketch(spark, storePath), Seq("r", "bkt"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
      .orderBy("token")
  }
}
