package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The stream-then-batch finishing pass: `compact` over a settled
  * window must land the store on EXACTLY the pure-batch result
  * (verified MinHash-LSH pairs → connected components → event-time-
  * canonical keeper per cluster), re-admitting candidate-level false
  * drops and evicting LSH misses / non-canonical keepers the stream
  * produced.  The fixture corpus is SEARCHED (deterministically — all
  * hashing is md5-based) for the collision shapes the reconciliation
  * must handle:
  *  - a band collision whose true Jaccard fails verification
  *    (stream false-drops the later doc → `readmit`);
  *  - a verified pair with collision (stream and batch agree → `keep`);
  * plus an out-of-order arrival (earlier event time, later batch)
  * whose stream keeper is non-canonical (`evict` + `readmit`).
  * Verified pairs are by construction a subset of band collisions
  * (candidates come from the same banding), so "a verified pair the
  * stream never saw collide" cannot exist — asserted below; the evict
  * action covers keeper replacement, not candidate recall. */
class StreamingNearDedupCompactSpec extends SparkSuite {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(hours: Int) =
    new Timestamp(base.getTime + hours * 3600L * 1000L)
  private def flushTs = new Timestamp(base.getTime + 60L * 86400L * 1000L)

  /** Pair corpus: doc 2i shares its first (12-k) tokens with doc 2i+1
    * (k = 3 → Jaccard 7/13 ≈ 0.538, verified but ≈50% chance of no
    * band collision; k = 4 → 6/14 ≈ 0.429, unverified but ≈28% chance
    * of a band collision).  Token vocabularies are disjoint across
    * pairs, so collisions only happen inside a pair. */
  private def pairDocs(nPairs: Int): Seq[(Long, String)] =
    (0 until nPairs).flatMap { i =>
      val k = if (i % 2 == 0) 3 else 4
      val a = (0 until 12).map(j => s"p${i}w$j")
      val b = a.dropRight(k) ++ (0 until k).map(j => s"p${i}x$j")
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, b.mkString(" ")))
    }

  /** (candidate band collisions, verified pairs) over (doc_id, text). */
  private def shapes(docs: DataFrame): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val bands = StreamingNearDedup.bandRows(
      docs.withColumn("ingest_ts", lit(base)))
    val coll = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ver = graft.ops.Dedup.verifiedPairsOf(docs.select("doc_id", "text"))
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (coll, ver)
  }

  /** Independent keeper election: Scala union-find over the verified
    * pairs + min-(ts, id) per cluster (the engine uses iterated
    * partition contraction — a different algorithm). */
  private def expectedKept(feed: Seq[(Long, Timestamp, String)],
                           verified: Set[(Long, Long)]): Set[Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    verified.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ts = feed.map { case (id, when, _) => id -> when.getTime }.toMap
    feed.map(_._1).groupBy(find)
      .map { case (_, members) => members.minBy(id => (ts(id), id)) }.toSet
  }

  test("compact lands the store on the pure batch result across out-of-order micro-batches") {
    val probe = pairDocs(80).toDF("doc_id", "text")
    val (coll, ver) = shapes(probe)
    val pairs = (0 until 80).map(i => (2L * i, 2L * i + 1))
    val falseDrop = pairs.find(p => coll.contains(p) && !ver.contains(p))
    val agreed = pairs.find(p => coll.contains(p) && ver.contains(p))
    assert(falseDrop.isDefined, "fixture must yield a collision that fails verification")
    assert(agreed.isDefined, "fixture must yield a verified colliding pair")
    assert(ver.subsetOf(coll),
      "verified pairs are generated from the banding, so they all collide")
    val text = probe.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // feed: 3 micro-batches, out-of-order third batch (doc oooB has the
    // EARLIEST event time of its pair but arrives last)
    val Seq((fdA, fdB), (agA, agB)) = Seq(falseDrop.get, agreed.get)
    val oooA = 9100L; val oooB = 9101L
    val oooText = (0 until 12).map(j => s"ooow$j").mkString(" ")
    val batches = Seq(
      Seq((fdA, t(0), text(fdA)), (agA, t(0), text(agA)), (oooA, t(5), oooText)),
      Seq((fdB, t(1), text(fdB)), (agB, t(1), text(agB))),
      Seq((oooB, t(1), oooText)))
    val feed = batches.flatten

    // run the stream over the batches
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingNearDedup.dedupDocs(
        input.toDS().toDF("doc_id", "ingest_ts", "text"))
      .writeStream.format("memory").queryName("compact_src")
      .outputMode("append").start()
    val streamKeptRows = try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq((9001L, flushTs, "watermark flush row one")))
      q.processAllAvailable()
      input.addData(Seq((9002L, flushTs, "watermark flush row two also")))
      q.processAllAvailable()
      spark.table("compact_src").collect()
    } finally q.stop()

    // stream behavior on the crafted shapes
    val keptIds = streamKeptRows.map(_.getLong(1)).toSet
    assert(!keptIds.contains(fdB), "false drop: stream drops the colliding unverified doc")
    assert(keptIds.contains(oooA) && !keptIds.contains(oooB),
      "out-of-order: stream keeps the first-processed member")

    // store: archive feed + stream kept, then compact a settled cutoff
    // that covers every data window but not the flush rows
    val store = Files.createTempDirectory("neardedup_store").toString
    feed.toDF("doc_id", "ingest_ts", "text")
      .write.parquet(s"$store/feed")
    streamKeptRows.toSeq.map(r => (r.getTimestamp(0), r.getLong(1)))
      .toDF("window_start", "doc_id").write.parquet(s"$store/kept")
    val actions = StreamingNearDedup.compact(spark, store, t(100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

    assert(actions(fdB) == "readmit", "false drop re-admitted")
    assert(actions(oooB) == "readmit" && actions(oooA) == "evict",
      "event-time-canonical keeper restored for the out-of-order pair")
    assert(actions(agA) == "keep")
    assert(!actions.contains(agB), "a doc dropped by both passes needs no action")

    // end state == pure batch result, via an independent union-find
    // over the feed's own verified pairs
    val feedDf = feed.toDF("doc_id", "ingest_ts", "text")
    val feedVer = graft.ops.Dedup.verifiedPairsOf(feedDf.select("doc_id", "text"))
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = expectedKept(feed, feedVer)
    val view = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val canon = StreamingNearDedup.canonicalKept(feedDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(view == canon, "keptView serves exactly the canonical set")
    assert(canon == expected, "canonical set matches the independent election")

    // idempotence: a second compact run changes nothing
    val actions2 = StreamingNearDedup.compact(spark, store, t(100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(actions2 == actions)
    val view2 = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(view2 == view)

    // crash window: a missing marker (died mid-swap) degrades keptView
    // to the live stream output — consistent, never a mixed cutoff
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store, "compact_cutoff"), false)
    val degraded = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(degraded == streamKeptRows.map(_.getLong(1)).toSet --
      Set(9001L, 9002L))
    // and the next compact run re-publishes a consistent view
    StreamingNearDedup.compact(spark, store, t(100)).collect()
    val restored = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(restored == view)

    // malformed marker (e.g. partially visible write on a
    // non-atomic-rename object store) degrades exactly like no marker
    val mOut = fs.create(
      new org.apache.hadoop.fs.Path(store, "compact_cutoff"), true)
    mOut.write("garbage, not a marker".getBytes("UTF-8")); mOut.close()
    val malformed = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(malformed == degraded,
      "malformed marker serves the live-only view, never throws")

    // recovery compact over the garbage marker: version counter derives
    // from on-disk dirs (no overwrite of a dir a grace reader may hold),
    // and retirement keeps the current + graceVersions most recent dirs
    StreamingNearDedup.compact(spark, store, t(100)).collect()
    val dirs = fs.globStatus(
        new org.apache.hadoop.fs.Path(store, "kept_compacted_v*"))
      .map(s => "_v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
        .get.group(1).toInt).sorted.toSeq
    assert(dirs.size == 3 && dirs.max == dirs.last,
      s"current + 2 grace versions retained, got $dirs")
    val recovered = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(recovered == view)
  }

  test("startPipeline wires the compact store layout end to end") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("np_src").toString
    val store = Files.createTempDirectory("np_store").toString
    def writeBatch(rows: Seq[(Long, Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ingest_ts", "text")
        .write.mode("append").parquet(src)
    def drain(): Unit = {
      val (fq, kq) = StreamingNearDedup.startPipeline(
        spark.readStream.schema("doc_id LONG, ingest_ts TIMESTAMP, text STRING")
          .parquet(src),
        store, trigger = Trigger.AvailableNow())
      fq.awaitTermination(120000); kq.awaitTermination(120000)
    }
    val textA = "the quick brown fox jumps over the lazy dog today"
    val textB = "pack my box with five dozen assorted liquor jugs"
    writeBatch(Seq((1L, t(0), textA), (2L, t(0), textB)))
    drain()
    writeBatch(Seq((3L, t(1), textA)))  // near-dup of 1 -> dropped
    drain()
    writeBatch(Seq((9001L, flushTs, "watermark flush row one")))
    drain()
    writeBatch(Seq((9002L, flushTs, "watermark flush row two also")))
    drain()
    // the library-wired store is exactly what compact/keptView consume
    val actions = StreamingNearDedup.compact(spark, store, t(100))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(actions == Map(1L -> "keep", 2L -> "keep"))
    val view = StreamingNearDedup.keptView(spark, store)
      .filter(col("window_start") < lit(t(100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(view == Set(1L, 2L))
  }
}
