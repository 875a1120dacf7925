package graft.ingest

import java.nio.file.Files
import java.util.concurrent.CopyOnWriteArrayList
import graft.SparkSuite
import graft.streaming.StreamingIngest

/** The write-path transport seam (S5): the HTTP POST sink must receive
  * exactly the batch's summary events, and a failing transport must
  * fail the batch (at-least-once), never drop it. */
class EventSinkSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String) = Files.createTempDirectory(tag).toString

  /** In-process event collector: records (batchIdHeader, body) per
    * SUCCESSFUL POST; the first `rejectFirst` hits get `failStatus`
    * and are NOT recorded (the transport-outage injection). */
  private def startCollector(status: Int = 200, rejectFirst: Int = 0,
      failStatus: Int = 503)
      : (com.sun.net.httpserver.HttpServer, String,
         CopyOnWriteArrayList[(String, String)]) = {
    val received = new CopyOnWriteArrayList[(String, String)]()
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/events",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (hits.incrementAndGet() <= rejectFirst) {
          ex.sendResponseHeaders(failStatus, 0)
        } else {
          received.add(
            (ex.getRequestHeaders.getFirst("X-Graft-Batch-Id"), body))
          ex.sendResponseHeaders(status, 0)
        }
        ex.close()
      })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/events",
      received)
  }

  test("streaming ingest delivers each batch's summary events over HTTP") {
    val (server, url, received) = startCollector()
    try {
      val sink = new EventSink.HttpPostSink(url)
      val (q, _) = StreamingIngest.start(spark, sf(),
        tmp("store") + "/bars", tmp("ckpt"), eventSink = Some(sink))
      q.awaitTermination(120000)

      assert(!received.isEmpty, "no POST arrived")
      import scala.jdk.CollectionConverters._
      val lines = received.asScala.flatMap(_._2.split("\n")).toSeq
      val got = spark.read.json(lines.toDS)
      // exactly the batch's summary rows: same relation the file sink
      // (and the ingest_summaries oracle query) is built from
      val expected = BarPipeline.summaryEventJson(
        BarPipeline.ingestSummaries(
          BarPipeline.canonicalBars(spark, sf())))
      assert(got.count() == expected.count())
      assert(got.select("event_type", "message").collect().toSet ==
        expected.collect().toSet)
      // every NDJSON line carries the batch id the header announces
      received.asScala.foreach { case (hdr, body) =>
        assert(hdr != null && hdr.nonEmpty)
        body.split("\n").foreach(l =>
          assert(l.contains(s""""batch_id":$hdr"""), l))
      }
    } finally server.stop(0)
  }

  test("file sink and HTTP sink can publish the same batch side by side") {
    val (server, url, received) = startCollector()
    try {
      val events = tmp("events") + "/summaries"
      val (q, _) = StreamingIngest.start(spark, sf(),
        tmp("store") + "/bars", tmp("ckpt"),
        eventsDir = Some(events),
        eventSink = Some(new EventSink.HttpPostSink(url)))
      q.awaitTermination(120000)
      val fromFiles = spark.read.json(events)
        .select("event_type", "message").collect().toSet
      import scala.jdk.CollectionConverters._
      val fromHttp = spark.read.json(
          received.asScala.flatMap(_._2.split("\n")).toSeq.toDS)
        .select("event_type", "message").collect().toSet
      assert(fromFiles.nonEmpty && fromFiles == fromHttp)
    } finally server.stop(0)
  }

  test("transport outage → failed batch → checkpoint replay redelivers") {
    // The EventSink contract end-to-end: a sink failure fails the
    // micro-batch (the query terminates with the error), and a restart
    // from the same checkpoint REPLAYS the batch — the outage becomes
    // redelivery, never silent loss.  The store write is keyed-
    // idempotent, so the replayed merge is a no-op on content.
    val (server, url, received) = startCollector(rejectFirst = 1)
    try {
      val store = tmp("store") + "/bars"
      val ckpt = tmp("ckpt")
      val sink = new EventSink.HttpPostSink(url)
      val (q1, _) = StreamingIngest.start(spark, sf(), store, ckpt,
        eventSink = Some(sink))
      val failed = intercept[Exception](q1.awaitTermination(120000))
      val chain = Iterator.iterate[Throwable](failed)(_.getCause)
        .takeWhile(_ != null).map(e => String.valueOf(e.getMessage))
        .mkString("\n")
      assert(chain.contains("503"), chain)
      assert(received.isEmpty, "rejected POST must not count as delivered")

      val (q2, _) = StreamingIngest.start(spark, sf(), store, ckpt,
        eventSink = Some(sink))
      q2.awaitTermination(120000)
      assert(!received.isEmpty, "replay did not redeliver")
      import scala.jdk.CollectionConverters._
      val got = spark.read.json(
        received.asScala.flatMap(_._2.split("\n")).toSeq.toDS)
      val expected = BarPipeline.summaryEventJson(
        BarPipeline.ingestSummaries(BarPipeline.canonicalBars(spark, sf())))
      assert(got.select("event_type", "message").collect().toSet ==
        expected.collect().toSet)
      // and the keyed store holds exactly one copy of every bar
      val bars = graft.ingest.BarStore.read(spark, store)
      assert(bars.count() ==
        bars.dropDuplicates(BarStore.key).count())
    } finally server.stop(0)
  }

  test("a rejecting endpoint fails the publish (at-least-once, no silent drop)") {
    val (server, url, _) = startCollector(status = 503)
    try {
      val sink = new EventSink.HttpPostSink(url)
      val df = Seq(("HistoricalDataUpdated", "{}")).toDF("event_type", "message")
      val e = intercept[IllegalArgumentException](sink.publish(df, 1L))
      assert(e.getMessage.contains("503"))
    } finally server.stop(0)
  }

  test("an empty batch publishes nothing") {
    val (server, url, received) = startCollector()
    try {
      new EventSink.HttpPostSink(url).publish(
        Seq.empty[(String, String)].toDF("event_type", "message"), 2L)
      assert(received.isEmpty)
    } finally server.stop(0)
  }

  test("an oversized batch is refused, not assembled on the driver") {
    val (server, url, received) = startCollector()
    try {
      val sink = new EventSink.HttpPostSink(url, maxEventsPerPost = 3)
      val df = (1 to 5).map(i => ("t", s"m$i")).toDF("event_type", "message")
      val e = intercept[IllegalArgumentException](sink.publish(df, 3L))
      assert(e.getMessage.contains("exceeds 3"))
      assert(received.isEmpty)
    } finally server.stop(0)
  }
}
