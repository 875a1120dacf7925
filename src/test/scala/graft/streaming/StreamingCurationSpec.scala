package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.streaming.Trigger

/** Streaming curation ≡ the batch quality-gate + split stages: the
  * scoring pass is stateless and narrow, so a corpus fed through the
  * stream equals the batch computation row-for-row. */
class StreamingCurationSpec extends SparkSuite {
  import spark.implicits._

  test("streamed curation equals the batch quality+split computation") {
    // batch expectation straight from the shared fragments
    val batch = StreamingCuration.curate(
      graft.Tables.documents(spark, sf()))
      .select($"doc_id", $"quality_score", $"split")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getString(2))))
      .toMap

    // stream the same fixture through AvailableNow (the file source
    // needs a directory — stage the fixture file into one)
    val dir = java.nio.file.Files.createTempDirectory("curation_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf() + "/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = graft.Tables.documents(spark, sf()).schema
    val q = StreamingCuration.curate(
      spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.format("memory").queryName("curated_docs")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "stream did not finish in time")
    finally q.stop()

    val streamed = spark.table("curated_docs")
      .select($"doc_id", $"quality_score", $"split")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getString(2))))
      .toMap
    assert(streamed.nonEmpty && streamed.size < 500) // the gate filtered
    assert(streamed == batch)
    // every surviving score clears the gate; splits are the 3 buckets
    assert(streamed.values.forall(_._1 >= 0.5))
    assert(streamed.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("the streaming pass keeps the batch plan shape: no state, no shuffle") {
    val plan = StreamingCuration.curate(graft.Tables.documents(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(!plan.contains("StateStore"), plan.take(800))
  }
}
