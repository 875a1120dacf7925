package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Compaction racing live `StreamingIndex` appends: a serve over the
  * store must see every appended vector exactly once regardless of
  * where in the compaction schedule the micro-batch landed.  The
  * deterministic interleave uses `compactIndex`'s test seam — the
  * micro-batch is processed after the compacted tmp copies are built
  * but BEFORE the park/publish swap, the widest window in which an
  * appended file can land in a partition the compactor is about to
  * replace (the rescue step's reason to exist). */
class StreamingIndexCompactSpec extends SparkSuite {
  import spark.implicits._

  private def serve(path: String, quantized: Boolean) =
    (if (quantized) graft.ops.Similarity.ivfQuantizedServeFrom(spark, sf(), path)
     else graft.ops.Similarity.ivfServeFrom(spark, sf(), path))
      .collect().map(_.toSeq).toSeq

  private def appendAll(path: String, quantized: Boolean,
      rows: Array[(Long, Seq[Float])]): Unit = {
    val df = rows.toSeq.toDF("vec_id", "embedding")
    if (quantized) graft.ops.Similarity.ivfQuantizedAppend(spark, sf(), path, df)
    else graft.ops.Similarity.ivfAppend(spark, sf(), path, df)
  }

  private def raceOnce(quantized: Boolean): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val full = graft.Tables.embeddings(spark, sf())
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (late, early) = full.partition(_._1 % 5 == 0)

    val path = java.nio.file.Files.createTempDirectory("sic").toString
    // fragment the store: several appends of the early slice
    (0 until 3).foreach { i =>
      appendAll(path, quantized, early.filter(_._1 % 3 == i))
    }

    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDS().toDF("vec_id", "embedding")
    val q =
      if (quantized) StreamingIndex.startQuantized(stream, sf(), path)
      else StreamingIndex.start(stream, sf(), path)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      // the late micro-batch lands inside the FIRST partition's
      // build→swap window; subsequent partitions see it in-snapshot
      val done = graft.ops.IndexCompaction.compactIndex(
        spark, path, 128L * 1024 * 1024,
        () => if (fired.compareAndSet(false, true)) {
          input.addData(late.toIndexedSeq: _*)
          q.processAllAvailable()
        }, "cid")
      assert(done.nonEmpty, "the fragmented fixture must compact")
      assert(fired.get(), "the race window must have been exercised")
    } finally q.stop()

    // exactly-once visibility: serving equals a fresh one-shot build
    // over the union — nothing lost to the swap, nothing doubled
    val fresh = java.nio.file.Files.createTempDirectory("sicf").toString
    appendAll(fresh, quantized, full)
    assert(serve(path, quantized).nonEmpty)
    assert(serve(path, quantized) === serve(fresh, quantized))
  }

  test("float store: a micro-batch landing mid-compaction is served exactly once") {
    raceOnce(quantized = false)
  }

  test("quantized store: a micro-batch landing mid-compaction is served exactly once") {
    raceOnce(quantized = true)
  }
}
