package graft.streaming

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming near-dup dedup ≡ the batch greedy mirror: a doc is kept
  * iff no earlier arrival shares a MinHash LSH band key, dropped docs
  * still register their fresh keys (chaining), and state survives a
  * checkpointed restart.  Within one micro-batch the keeper is
  * event-time canonical and deterministic (min (ingest_ts, doc_id) —
  * pinned by the repeated-run test); the stream-vs-batch equalities
  * additionally feed colliding docs in distinct micro-batches so the
  * cross-batch first-processed contract lines up with event order. */
class StreamingNearDedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(hours: Int) =
    new Timestamp(base.getTime + hours * 3600L * 1000L)
  /** Far enough past `base` that the 30-day watermark passes every
    * data window once a row with this stamp commits. */
  private def flushTs = new Timestamp(base.getTime + 60L * 86400L * 1000L)

  private val textA = "the quick brown fox jumps over the lazy dog today"
  private val textB = "pack my box with five dozen assorted liquor jugs"
  private val textC = "sphinx of black quartz judge my vow said the king"
  private val textD = "how vexingly quick daft zebras jump over fences"

  /** Run the streaming dedup over `batches` (one micro-batch each),
    * then flush the watermark and return the kept doc_ids. */
  private def runStream(name: String,
      batches: Seq[Seq[(Long, Timestamp, String)]]): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingNearDedup.dedupDocs(
        input.toDS().toDF("doc_id", "ingest_ts", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // two flush batches: the first advances the watermark past every
      // data window, the second runs with that watermark and emits the
      // finalized windows
      input.addData(Seq((9001L, flushTs, "watermark flush row one")))
      q.processAllAvailable()
      input.addData(Seq((9002L, flushTs, "watermark flush row two also")))
      q.processAllAvailable()
      spark.table(name).select("doc_id").collect().map(_.getLong(0)).toSet
    } finally q.stop()
  }

  test("kept set equals the batch greedy mirror across 3 micro-batches") {
    val batches = Seq(
      Seq((1L, t(0), textA), (2L, t(0), textB)),
      // 3 is an exact near-dup of 1 (all bands collide); 4 is fresh
      Seq((3L, t(1), textA), (4L, t(1), textC)),
      // 5 is a one-word variant of 2 (shares shingles → some bands);
      // 6 is fresh — whatever the banding decides for 5, the stream
      // must agree with the batch mirror
      Seq((5L, t(2), textB.replace("dozen", "large")), (6L, t(2), textD)))
    val kept = runStream("near_dedup_sync", batches)
    val arrivals = batches.flatten.toDF("doc_id", "ingest_ts", "text")
    val expected = StreamingNearDedup.batchKept(arrivals)
      .collect().map(_.getLong(0)).toSet
    assert(kept == expected)
    assert(Set(1L, 2L, 4L, 6L).subsetOf(kept))
    assert(!kept.contains(3L)) // exact dup of an earlier arrival
  }

  test("same-batch collision keeps the event-time-canonical member, deterministically") {
    // 11 and 10 collide on every band; 10 has the smaller (ts, doc_id)
    // so it must win regardless of processing order — repeated runs of
    // the same multi-collision micro-batch pin the determinism
    val batches = Seq(
      Seq((11L, t(0), textA), (10L, t(0), textA), (12L, t(0), textB),
        (14L, t(1), textC), (13L, t(0), textC)))
    val kept1 = runStream("near_dedup_tie1", batches)
    val kept2 = runStream("near_dedup_tie2", batches)
    assert(kept1 == Set(10L, 12L, 13L))
    assert(kept2 == kept1)
  }

  test("documents with empty gram sets never collide and are all kept") {
    // fewer than 3 tokens → graft_shingles3 is empty → NULL signature
    val kept = runStream("near_dedup_empty", Seq(
      Seq((20L, t(0), "tiny doc"), (21L, t(0), "tiny doc")),
      Seq((22L, t(1), "tiny doc"))))
    assert(kept == Set(20L, 21L, 22L))
  }

  test("streamed fixture corpus equals the batch mirror (no intra-batch collisions)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf())
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // collision graph: candidate pairs from one batch band self-join
    val bandsDf = StreamingNearDedup.bandRows(
      docs.map { case (id, tx) => (id, t(0), tx) }
        .toSeq.toDF("doc_id", "ingest_ts", "text"))
    val pairs = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // greedy (Δ+1)-coloring in doc_id order → micro-batches with no
    // internal collisions, so arrival order is fully deterministic
    val color = scala.collection.mutable.Map.empty[Long, Int]
    docs.foreach { case (id, _) =>
      val used = adj.getOrElse(id, Set.empty).flatMap(color.get)
      color(id) = Iterator.from(0).find(c => !used.contains(c)).get
    }
    var batches = docs.groupBy { case (id, _) => color(id) }
      .toSeq.sortBy(_._1).map(_._2.toSeq)
    // ensure ≥3 micro-batches by splitting (splitting preserves the
    // no-intra-batch-collision property)
    while (batches.length < 3) {
      val (big, rest) = (batches.maxBy(_.length),
        batches.filterNot(_ eq batches.maxBy(_.length)))
      val (l, r) = big.splitAt(big.length / 2)
      batches = rest ++ Seq(l, r).filter(_.nonEmpty)
    }
    val stamped = batches.zipWithIndex.map { case (b, i) =>
      b.map { case (id, tx) => (id, t(i), tx) }
    }
    val kept = runStream("near_dedup_corpus", stamped)
    val expected = StreamingNearDedup.batchKept(
        stamped.flatten.toDF("doc_id", "ingest_ts", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < docs.length)
    // verified batch near-dup pairs are a subset of candidates: the
    // later-arriving member of every dedup_minhash_lsh pair must have
    // been dropped by the stream
    val order = stamped.flatten.map(_._1).zipWithIndex.toMap
    graft.ops.Dedup.minhashLsh(spark, sf())
      .select("doc_id_a", "doc_id_b").collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val later = if (order(a) > order(b)) a else b
        assert(!kept.contains(later), s"pair ($a,$b): $later kept")
      }
  }

  test("band-key state survives a checkpointed restart") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("neardedup_src").toString
    val ckpt = Files.createTempDirectory("neardedup_ckpt").toString
    val out = Files.createTempDirectory("neardedup_out").toString
    def writeBatch(rows: Seq[(Long, Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ingest_ts", "text")
        .write.mode("append").parquet(src)
    def drain(): Unit = {
      val q = StreamingNearDedup.dedupDocs(
        spark.readStream.schema("doc_id LONG, ingest_ts TIMESTAMP, text STRING")
          .parquet(src))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    writeBatch(Seq((1L, t(0), textA), (2L, t(0), textB)))
    drain()
    // restart from the checkpoint: the near-dup of doc 1 must be
    // dropped by band-key state recovered from it
    writeBatch(Seq((3L, t(1), textA), (4L, t(1), textC)))
    drain()
    // advance the watermark (new data is required for AvailableNow to
    // schedule the batch that emits the finalized windows)
    writeBatch(Seq((9001L, flushTs, "watermark flush row one")))
    drain()
    writeBatch(Seq((9002L, flushTs, "watermark flush row two also")))
    drain()
    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
  }
}
