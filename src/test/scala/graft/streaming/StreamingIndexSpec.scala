package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streamed index maintenance ≡ one batch build: embeddings fed in
  * micro-batches through `StreamingIndex.start` must serve exactly
  * the results of a single `ivfAppend` bootstrap over the union. */
class StreamingIndexSpec extends SparkSuite {
  import spark.implicits._

  test("an index grown from a stream serves exactly the batch-built results") {
    implicit val sqlCtx = spark.sqlContext
    val full = graft.Tables.embeddings(spark, sf())
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (a, b) = full.partition(_._1 % 2 == 0)

    val streamed = java.nio.file.Files.createTempDirectory("sidx").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIndex.start(
      input.toDS().toDF("vec_id", "embedding"), sf(), streamed)
    try {
      input.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val batch = java.nio.file.Files.createTempDirectory("bidx").toString
    graft.ops.Similarity.ivfAppend(spark, sf(), batch,
      graft.Tables.embeddings(spark, sf()).select($"vec_id", $"embedding"))

    val rStream = graft.ops.Similarity.ivfServeFrom(spark, sf(), streamed)
      .collect().map(_.toSeq).toSeq
    val rBatch = graft.ops.Similarity.ivfServeFrom(spark, sf(), batch)
      .collect().map(_.toSeq).toSeq
    assert(rStream.nonEmpty && rStream == rBatch)

    // at-least-once replay: re-appending a batch (the crash-recovery
    // case) must not change what the index serves — duplicates are
    // deduped by id before ranking
    graft.ops.Similarity.ivfAppend(spark, sf(), streamed,
      b.toSeq.toDF("vec_id", "embedding"))
    val rReplayed = graft.ops.Similarity.ivfServeFrom(spark, sf(), streamed)
      .collect().map(_.toSeq).toSeq
    assert(rReplayed == rBatch, "replayed rows must not occupy extra ranks")
  }

  test("a quantized index grown from a stream serves the batch-built results") {
    implicit val sqlCtx = spark.sqlContext
    val full = graft.Tables.embeddings(spark, sf())
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (a, b) = full.partition(_._1 % 2 == 0)

    val streamed = java.nio.file.Files.createTempDirectory("sqidx").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIndex.startQuantized(
      input.toDS().toDF("vec_id", "embedding"), sf(), streamed)
    try {
      input.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val batch = java.nio.file.Files.createTempDirectory("bqidx").toString
    graft.ops.Similarity.ivfQuantizedAppend(spark, sf(), batch,
      graft.Tables.embeddings(spark, sf()).select($"vec_id", $"embedding"))

    val rStream = graft.ops.Similarity
      .ivfQuantizedServeFrom(spark, sf(), streamed)
      .collect().map(_.toSeq).toSeq
    val rBatch = graft.ops.Similarity
      .ivfQuantizedServeFrom(spark, sf(), batch)
      .collect().map(_.toSeq).toSeq
    assert(rStream.nonEmpty && rStream == rBatch)

    // replayed micro-batch: int8 duplicates dedup by id before ranking
    graft.ops.Similarity.ivfQuantizedAppend(spark, sf(), streamed,
      b.toSeq.toDF("vec_id", "embedding"))
    val rReplayed = graft.ops.Similarity
      .ivfQuantizedServeFrom(spark, sf(), streamed)
      .collect().map(_.toSeq).toSeq
    assert(rReplayed == rBatch)
  }
}
