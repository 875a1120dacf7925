package graft.streaming

import graft.SparkSuite

/** The streamed Count-Min store ≡ the one-pass batch sketch: cell-wise
  * BIGINT sums are associative/commutative, so any micro-batch split
  * of the corpus merges to the identical sketch — the property that
  * makes the sketch the 100 TB answer to token frequency. */
class StreamingSketchSpec extends SparkSuite {
  import spark.implicits._

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.select("r", "bkt", "c").collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bkt")) -> r.getAs[Long]("c"))
      .toMap

  test("stream-merged sketch equals the one-pass batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf())
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val store = java.nio.file.Files.createTempDirectory("cm_store").toString

    val input = MemoryStream[(Long, String)]
    val q = StreamingSketch.start(
      input.toDS().toDF("doc_id", "text"), store)
    try {
      docs.grouped(200).foreach { slice =>
        input.addData(slice.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val merged = cells(StreamingSketch.mergedSketch(spark, store))
    val batch = cells(StreamingSketch.cmPartial(
      graft.Tables.documents(spark, sf()).select($"doc_id", $"text")))
    assert(merged == batch, "merged partials must equal the one-pass sketch")

    // estimates served from the streamed store match the oracle-checked
    // batch relation's cm_est column token-for-token
    val hh = graft.ops.TextFilters.heavyHitters(spark, sf())
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cm_est"))
      .toMap
    val served = StreamingSketch.estimate(spark, store, hh.keys.toSeq)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cm_est"))
      .toMap
    assert(served == hh, "streamed-store estimates == batch cm_est")

    // crash-replay idempotence: refolding an already-applied batch id
    // (the exact rows batch 0 carried) lands as a NEW attempt directory
    // (append-only — the old partial is never deleted, so a concurrent
    // merge can't transiently read the batch as zero cells) and merge-
    // time dedup keeps one attempt per batch: the merged sketch is
    // unchanged
    val replayed = docs.take(200).toSeq.toDF("doc_id", "text")
    StreamingSketch.appendBatch(replayed, store, 0L)
    assert(cells(StreamingSketch.mergedSketch(spark, store)) == batch,
      "replaying batch 0 must not change the merged sketch")
    val batch0 = new java.io.File(s"$store/batch=0")
    assert(batch0.listFiles().count(_.getName.startsWith("attempt=")) == 2,
      "a replay must append a fresh attempt, not overwrite")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }

  test("an empty or absent store reads as empty, never throws") {
    val missing = java.nio.file.Files.createTempDirectory("cm_none").toString
    // absent store dir (stream never started writing)
    assert(StreamingSketch.mergedSketch(spark, s"$missing/nope").count() == 0)
    assert(StreamingSketch.estimateQuantiles(
      spark, s"$missing/nope", 0.0, 1.0, 8, Seq(0.5)).isEmpty)
    // store dir exists but no batch committed yet (checkpoint dir only)
    assert(StreamingSketch.mergedHist(spark, missing).count() == 0)
    // racing the FIRST write: batch/attempt dirs exist, data file not
    // yet committed — reads as empty, never a schema-inference error
    val racing = java.nio.file.Files.createTempDirectory("cm_race")
    java.nio.file.Files.createDirectories(
      racing.resolve("batch=0").resolve("attempt=1"))
    assert(StreamingSketch.mergedSketch(spark, racing.toString).count() == 0)
    org.apache.commons.io.FileUtils.deleteDirectory(racing.toFile)
    // point estimates over an empty sketch: 0 (an empty cell is a zero
    // counter), not NULL and not a crash
    val est = StreamingSketch.estimate(spark, missing, Seq("tok"))
      .collect()
    assert(est.map(r => r.getAs[String]("token") -> r.getAs[Long]("cm_est"))
      .toMap == Map("tok" -> 0L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(missing))
  }

  test("a corrupted store surfaces its analysis error — never reads as empty") {
    // ADVICE r12: only the no-committed-file race may degrade to an
    // empty sketch.  A store whose files exist but carry the WRONG
    // schema (drift/corruption) must throw — a monitoring sketch that
    // silently reports 'no heavy hitters' for a broken store is worse
    // than one that fails.
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("cm_drift")
    try {
      Seq((1, "x")).toDF("wrong", "columns")
        .write.parquet(s"$store/batch=0/attempt=1")
      intercept[org.apache.spark.sql.AnalysisException] {
        StreamingSketch.mergedSketch(spark, store.toString).count()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(store.toFile)
    }
  }

  test("stream-merged histogram serves quantiles within the bin-width bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val xs = graft.Tables.load(spark, sf(), "lineitem")
      .select($"l_extendedprice").collect().map(_.getDouble(0))
    // production pins the range a priori; the spec pins it to the data
    val (lo, hi, bins) = (xs.min, xs.max, 128)
    val store = java.nio.file.Files.createTempDirectory("hist_store").toString

    val input = MemoryStream[Double]
    val q = StreamingSketch.startHist(
      input.toDS().toDF("x"), "x", store, lo, hi, bins)
    try {
      xs.grouped(xs.length / 3 + 1).foreach { slice =>
        input.addData(slice.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // merged partials ≡ the one-pass histogram
    val merged = StreamingSketch.mergedHist(spark, store).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("c")).toMap
    val batch = StreamingSketch.histPartial(
        xs.toSeq.toDF("x"), "x", lo, hi, bins).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("c")).toMap
    assert(merged == batch)
    assert(merged.values.sum == xs.length)

    // quantiles served from the stream-built store: within one bin
    // width of the exact sort-interpolate answer
    val sorted = xs.sorted
    val w = (hi - lo) / bins
    StreamingSketch.estimateQuantiles(
        spark, store, lo, hi, bins, Seq(0.5, 0.9, 0.99))
      .foreach { case (p, est) =>
        val rank = p * (sorted.length - 1)
        val (i, f) = (rank.toInt, rank - rank.toInt)
        val exact = if (i + 1 < sorted.length)
          sorted(i) + f * (sorted(i + 1) - sorted(i)) else sorted(i)
        assert(math.abs(est - exact) <= w, s"p=$p est=$est exact=$exact w=$w")
      }

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }
}
