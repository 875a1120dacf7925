package graft.streaming

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The COMPOSED curation DAG (quality → PII redact → surprisal gate →
  * near-dup dedup) as ONE streaming job, pinned row-for-row against
  * the composed batch mirror built from the same fragments.  The
  * fixture exercises every gate: a quality failer, a surprisal failer
  * in each direction (OOV gibberish high, memorized boilerplate low),
  * a PII pair whose members differ ONLY in their email addresses (so
  * dedup fires on the REDACTED text — the redact-then-dedup ordering
  * is observable), and a cross-window exact near-dup. */
class StreamingCurationDagSpec extends SparkSuite {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(hours: Int) =
    new Timestamp(base.getTime + hours * 3600L * 1000L)
  private def flushTs = new Timestamp(base.getTime + 60L * 86400L * 1000L)

  private val textA = "the quick brown fox jumps over the lazy dog"
  private val textB = "pack my box with five dozen liquor jugs"
  // reference corpus for the unigram model; includes the 'pii' token
  // the redaction tag tokenizes to, so redacted docs stay in-band
  private def model() = StreamingCuration.unigramModel(
    Seq((1L, textA), (2L, textB + " pii")).toDF("doc_id", "text"))

  private val MinScore = 0.15
  private val SurLo = 2.5
  private val SurHi = 8.0

  // (doc_id, arrival window hour, text, expected-kept)
  private val docs = Seq(
    (1L, 0, textA, true),                       // clean, in-band
    (2L, 0, textB, true),                       // clean, in-band
    (3L, 0, "$$$ 12345 !!! ### 678 @@@ 90 %%%", false), // quality fail
    // the PII pair's body reuses the model vocabulary but SCRAMBLED —
    // in-band surprisal without sharing any 3-gram shingle with doc 1
    (4L, 1, "contact me at bob@example.com dog lazy the over jumps fox brown quick the", true),
    (5L, 1, "contact me at alice@other.org dog lazy the over jumps fox brown quick the", false), // ≡ 4 redacted → dup
    (6L, 1, "zzqy xkcd vwpq mmnn ggrr hhtt bbcc ddee", false), // OOV → surprisal high
    (7L, 2, "the the the the the the the the", false), // boilerplate → surprisal low
    (8L, 2, textA, false))                      // near-dup of 1, later window

  private def arrivals: Seq[(Long, Timestamp, String)] =
    docs.map { case (id, h, tx, _) => (id, t(h), tx) }

  test("composed stream ≡ composed batch, every gate live") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingCuration.curationDag(
        input.toDS().toDF("doc_id", "ingest_ts", "text"), model(),
        minScore = MinScore, minSurprisal = SurLo, maxSurprisal = SurHi)
      .writeStream.format("memory").queryName("curation_dag")
      .outputMode("append").start()
    val flushes = Seq(
      (9001L, flushTs, "sphinx of black quartz judge my vow said then"),
      (9002L, flushTs, "how vexingly quick daft zebras jump over fences"),
      (9003L, flushTs, "grumpy wizards make toxic brew for the evil queen"))
    val streamed = try {
      arrivals.groupBy(_._2).toSeq.sortBy(_._1.getTime).foreach { case (_, b) =>
        input.addData(b); q.processAllAvailable()
      }
      flushes.foreach { f => input.addData(Seq(f)); q.processAllAvailable() }
      spark.table("curation_dag").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)))
        .filter(_._2 < 9000L).toSet
    } finally q.stop()

    // expected kept set from the fixture design
    assert(streamed.map(_._2) ==
      docs.filter(_._4).map(_._1).toSet,
      s"kept = clean docs + redacted PII keeper, got $streamed")
    // every kept row's window is the doc's arrival hour
    val hourOf = docs.map { case (id, h, _, _) => id -> t(h) }.toMap
    streamed.foreach { case (w, id) => assert(w == hourOf(id), s"doc $id") }

    // composed batch mirror over the same arrivals (flush rows
    // included — both pipelines must treat them identically)
    val mirror = StreamingCuration.curationDagBatch(
        (arrivals ++ flushes).toDF("doc_id", "ingest_ts", "text"), model(),
        minScore = MinScore, minSurprisal = SurLo, maxSurprisal = SurHi)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
      .filter(_._2 < 9000L).toSet
    assert(streamed == mirror, "stream ≡ batch mirror, pairs and windows")
  }

  test("startCurationPipeline wires the gated feed into the compact store") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("cur_src").toString
    val store = Files.createTempDirectory("cur_store").toString
    def writeBatch(rows: Seq[(Long, Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ingest_ts", "text")
        .write.mode("append").parquet(src)
    def drain(): Unit = {
      val (fq, kq) = StreamingCuration.startCurationPipeline(
        spark.readStream.schema("doc_id LONG, ingest_ts TIMESTAMP, text STRING")
          .parquet(src),
        model(), store, minScore = MinScore,
        minSurprisal = SurLo, maxSurprisal = SurHi,
        trigger = Trigger.AvailableNow())
      fq.awaitTermination(120000); kq.awaitTermination(120000)
    }
    arrivals.groupBy(_._2).toSeq.sortBy(_._1.getTime).foreach { case (_, b) =>
      writeBatch(b); drain()
    }
    writeBatch(Seq((9001L, flushTs, "sphinx of black quartz judge my vow said then")))
    drain()
    writeBatch(Seq((9002L, flushTs, "how vexingly quick daft zebras jump over fences")))
    drain()
    // the archived feed is the POST-GATE corpus: quality/surprisal
    // failers absent, the PII pair stored redacted
    val feed = spark.read.parquet(s"$store/feed")
      .filter(col("doc_id") < 9000L).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(feed.keySet == Set(1L, 2L, 4L, 5L, 8L))
    assert(feed(4L) == feed(5L) && feed(4L).contains("<pii>"),
      "feed holds the redacted text")
    // kept set matches the DAG; compact over the same feed is a no-op
    // apart from confirming keeps (stream already canonical here)
    val kept = StreamingNearDedup.keptView(spark, store)
      .filter(col("doc_id") < 9000L)
      .collect().map(_.getLong(1)).toSet
    assert(kept == docs.filter(_._4).map(_._1).toSet)
    val actions = StreamingNearDedup.compact(spark, store, t(100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(actions.forall(_._2 == "keep"), s"already canonical: $actions")
    val served = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .filter(col("doc_id") < 9000L)
      .collect().map(_.getLong(1)).toSet
    assert(served == kept)
  }

  test("stage attribution: each dropped doc fails exactly the designed gate") {
    import org.apache.spark.sql.functions._
    val df = arrivals.toDF("doc_id", "ingest_ts", "text")
    // quality stage
    val qKept = StreamingCuration.curate(df, MinScore)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(qKept == Set(1L, 2L, 4L, 5L, 6L, 7L, 8L), "only doc 3 fails quality")
    // PII stage redacts 4 and 5 into the SAME text
    val redacted = StreamingCuration.piiGate(df.filter("doc_id IN (4, 5)"))
      .select("text").collect().map(_.getString(0)).toSet
    assert(redacted.size == 1, "only-email-diff pair collapses under redaction")
    // surprisal stage over the gated feed
    val gated = StreamingCuration.piiGate(StreamingCuration.curate(df, MinScore))
    val sKept = StreamingCuration.surprisalGateWithText(
        gated, model(), SurLo, SurHi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sKept == Set(1L, 2L, 4L, 5L, 8L),
      "doc 6 (OOV gibberish) and doc 7 (boilerplate) fail the band")
  }
}
