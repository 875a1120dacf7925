package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract
  * / frame-sample operators.
  *
  * The container has no codec libraries, so the *decode* step is a
  * clearly-marked deterministic stub (`decodeStub`) — byte-level
  * features standing in for real pixel/sample decoding.  Everything
  * around it — binary column schema, typed Dataset encoding, the
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas`:
  * one iterator per partition, no per-row UDF dispatch), partitioning
  * and the aggregation plan — is real and tested.
  *
  * The media table is synthesized deterministically from `documents`
  * (payload = UTF-8 bytes of the text; the corpus is pure ASCII so the
  * DuckDB oracle can mirror byte logic with char logic 1:1).
  *
  * Scale notes: payloads stay opaque binary until the last possible
  * operator (no decode-then-shuffle); frame explosion produces rows
  * proportional to payload size — at 100 TB, frame sampling happens
  * *inside* the generator expression (the `frame_idx % 4` predicate is
  * applied before the md5), never on materialized full frames.
  */
object Multimodal {

  val FrameBytes = 64
  val FrameSampleEvery = 4

  /** documents → media items: type from doc_id mod 3, payload = text
    * bytes, typed metadata derived deterministically per type. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("media_type"),
      $"text".cast("binary").as("payload"),
      struct(
        (lit(64) * ($"doc_id" % 8 + 1)).cast("long").as("width"),
        (lit(64) * ($"doc_id" % 4 + 1)).cast("long").as("height"),
        (lit(8000) * ($"doc_id" % 3 + 1)).cast("long").as("sample_rate"),
        (($"doc_id" % 2) + 1).cast("long").as("channels")
      ).as("meta"))
  }

  /** Per-type inventory over the binary payloads and typed metadata. */
  def inventory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"doc_id", $"media_type",
        octet_length($"payload").cast("long").as("bytes"),
        when($"media_type" === "image", $"meta.width" * $"meta.height")
          .otherwise(0L).as("pixels"),
        when($"media_type" === "video",
          (octet_length($"payload").cast("long") + FrameBytes - 1)
            .divide(FrameBytes).cast("long"))
          .otherwise(0L).as("frames"))
      .groupBy($"media_type")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"bytes").as("total_bytes"),
        round(avg($"bytes"), 6).as("avg_bytes"),
        sum($"pixels").as("total_pixels"),
        sum($"frames").as("total_frames"))
      .orderBy($"media_type")
  }

  def inventoryOracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    CAST(length(text) AS BIGINT) AS bytes
       |  FROM documents)
       |SELECT media_type, count(*) AS n_items,
       |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
       |  round(avg(bytes), 6) AS avg_bytes,
       |  CAST(sum(CASE WHEN media_type = 'image'
       |      THEN (64 * (doc_id % 8 + 1)) * (64 * (doc_id % 4 + 1)) ELSE 0 END) AS BIGINT) AS total_pixels,
       |  CAST(sum(CASE WHEN media_type = 'video'
       |      THEN (bytes + ${FrameBytes - 1}) // $FrameBytes ELSE 0 END) AS BIGINT) AS total_frames
       |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Payload-level exact dedup summary — the FIRST curation step of a
    * multimodal pipeline: identical binary payloads (re-crawled
    * images, re-encoded copies of the same upload) are found by
    * content digest BEFORE any decode work is spent on them.  The
    * digest is md5 over the raw payload bytes, so the operator never
    * interprets the media; per type it reports item count, distinct
    * payloads, and the duplicate fraction.  One map-side-combining
    * aggregate over (type, digest) — the same scale shape as
    * `dedup_exact`, with payloads reduced to 16-byte digests at the
    * scan. */
  def payloadDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_type", md5($"payload").as("digest"))
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_items"),
        countDistinct($"digest").as("n_distinct_payloads"))
      .select($"media_type", $"n_items", $"n_distinct_payloads",
        round(lit(1.0) - $"n_distinct_payloads".cast("double") / $"n_items", 6)
          .as("dup_frac"))
      .orderBy($"media_type")
  }

  /** Oracle: the payload is the text's UTF-8 bytes by construction, so
    * DuckDB's md5 over the VARCHAR lands on the identical digest. */
  def payloadDedupOracleSql: String =
    """WITH m AS (
      |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS media_type, md5(text) AS digest
      |  FROM documents)
      |SELECT media_type, count(*) AS n_items,
      |  count(DISTINCT digest) AS n_distinct_payloads,
      |  round(1 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*), 6)
      |    AS dup_frac
      |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Frame sampling for video payloads: fixed-size frames, every 4th
    * sampled, content-addressed by md5.  The sample predicate lives
    * inside the generator (filter before explode output is consumed). */
  def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter($"media_type" === "video")
      .select($"doc_id", $"payload",
        ((octet_length($"payload") + FrameBytes - 1) / FrameBytes)
          .cast("int").as("n_frames"))
      .select($"doc_id", $"payload",
        explode(filter(sequence(lit(0), $"n_frames" - 1),
          i => i % FrameSampleEvery === 0)).as("frame_idx"))
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        expr(s"substring(CAST(payload AS STRING), frame_idx * $FrameBytes + 1, $FrameBytes)")
          .as("frame"))
      .select($"doc_id", $"frame_idx",
        length($"frame").cast("long").as("frame_len"),
        md5($"frame").as("frame_md5"))
      .orderBy($"doc_id", $"frame_idx")
  }

  def videoFramesOracleSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, ((len + ${FrameBytes - 1}) // $FrameBytes) - 1)) AS frame_idx
       |  FROM v),
       |s AS (
       |  SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |    substring(text, frame_idx * $FrameBytes + 1, $FrameBytes) AS frame
       |  FROM f WHERE frame_idx % $FrameSampleEvery = 0)
       |SELECT doc_id, frame_idx,
       |  CAST(length(frame) AS BIGINT) AS frame_len,
       |  md5(frame) AS frame_md5
       |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize plumbing for image payloads: stride-resample the byte
    * stream down to a fixed 8×8 thumbnail (64 samples at positions
    * floor(i·len/64)).  A real implementation would do bilinear pixel
    * interpolation after decode; the sampling math, schema, and
    * content-addressing are the real plumbing and fully
    * oracle-checked.  Pure narrow projection — no shuffle. */
  val ThumbSamples = 64

  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter($"media_type" === "image")
      .select($"doc_id", $"meta.width".as("src_w"), $"meta.height".as("src_h"),
        expr("CAST(payload AS STRING)").as("s"))
      .withColumn("len", length($"s"))
      .withColumn("thumb", expr(
        s"""array_join(transform(sequence(0, ${ThumbSamples - 1}),
           |  i -> substring(s, CAST((i * len) DIV $ThumbSamples AS INT) + 1, 1)), '')""".stripMargin))
      .select($"doc_id", $"src_w", $"src_h",
        lit(8L).as("out_w"), lit(8L).as("out_h"),
        length($"thumb").cast("long").as("thumb_len"),
        md5($"thumb").as("thumb_md5"))
      .orderBy($"doc_id")
  }

  def imageResizeOracleSql: String =
    s"""WITH img AS (
       |  SELECT doc_id, text AS s, length(text) AS len,
       |    CAST(64 * (doc_id % 8 + 1) AS BIGINT) AS src_w,
       |    CAST(64 * (doc_id % 4 + 1) AS BIGINT) AS src_h
       |  FROM documents WHERE doc_id % 3 = 0),
       |t AS (
       |  SELECT doc_id, src_w, src_h,
       |    array_to_string(list_transform(generate_series(0, ${ThumbSamples - 1}),
       |      i -> substring(s, (i * len) // $ThumbSamples + 1, 1)), '') AS thumb
       |  FROM img)
       |SELECT doc_id, src_w, src_h,
       |  CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
       |  CAST(length(thumb) AS BIGINT) AS thumb_len,
       |  md5(thumb) AS thumb_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** Audio windowing: split each audio payload into 10 ms windows
    * using the item's own sample_rate/channels metadata (1 byte per
    * sample stub — a real codec would decode PCM first), with
    * per-window amplitude stats.  The window length varies per row
    * (typed metadata drives the operator), unlike the fixed-size
    * video frames. */
  def audioWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter($"media_type" === "audio")
      .select($"doc_id", $"meta.sample_rate".as("rate"),
        $"meta.channels".as("channels"),
        expr("CAST(payload AS STRING)").as("s"))
      // 10 ms of samples per channel — integer division on both sides
      .withColumn("wl", expr("CAST((rate DIV 100) DIV channels AS INT)"))
      .withColumn("len", length($"s"))
      .select($"doc_id", $"rate", $"channels", $"wl", $"s", $"len",
        // sequence0 guard: Spark's sequence(0, -1) DESCENDS, so an
        // empty payload must yield no windows, as in the oracle
        explode(expr(SparkDialect.sequence0(
          "CAST((len + wl - 1) DIV wl AS INT)"))).as("window_idx"))
      .select($"doc_id", $"rate", $"channels",
        $"window_idx".cast("long").as("window_idx"),
        expr("substring(s, window_idx * wl + 1, wl)").as("w"))
      .select($"doc_id", $"rate", $"channels", $"window_idx",
        length($"w").cast("long").as("n_samples"),
        round(expr(
          """CAST(aggregate(transform(sequence(1, length(w)),
            |  i -> ascii(substring(w, i, 1))), 0L, (a, x) -> a + CAST(x AS LONG))
            |  AS DOUBLE) / length(w)""".stripMargin), 6).as("avg_amp"))
      .orderBy($"doc_id", $"window_idx")
  }

  def audioWindowsOracleSql: String =
    s"""WITH a AS (
       |  SELECT doc_id, text AS s, length(text) AS len,
       |    CAST(8000 * (doc_id % 3 + 1) AS BIGINT) AS rate,
       |    CAST((doc_id % 2) + 1 AS BIGINT) AS channels,
       |    CAST((8000 * (doc_id % 3 + 1) // 100) // ((doc_id % 2) + 1)
       |      AS INTEGER) AS wl
       |  FROM documents WHERE doc_id % 3 = 1),
       |e AS (
       |  SELECT doc_id, rate, channels, wl, s,
       |    unnest(generate_series(0, ((len + wl - 1) // wl) - 1)) AS window_idx
       |  FROM a),
       |w AS (
       |  SELECT doc_id, rate, channels, CAST(window_idx AS BIGINT) AS window_idx,
       |    substring(s, window_idx * wl + 1, wl) AS w
       |  FROM e)
       |SELECT doc_id, rate, channels, window_idx,
       |  CAST(length(w) AS BIGINT) AS n_samples,
       |  round(CAST(list_reduce(list_prepend(0, list_transform(
       |    generate_series(1, length(w)), i -> ascii(substring(w, i, 1)))),
       |    (a, x) -> a + x) AS DOUBLE) / length(w), 6) AS avg_amp
       |FROM w ORDER BY doc_id, window_idx""".stripMargin

  // ---- decode / feature extraction (stubbed codec) -----------------

  case class MediaItem(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, feat_len: Long,
                           avg_byte: Double, min_byte: Long, max_byte: Long)

  /** Decode one media item.  A real implementation would dispatch on
    * media_type to an image/audio/video codec; this container has no
    * codec libraries, so the decode is STUBBED with deterministic
    * byte-level features.  The batch shape (partition iterator in,
    * iterator out) is exactly what a real vectorized decoder needs. */
  def decodeStub(m: MediaItem): MediaFeatures = {
    // realDecode(m.payload)  // ??? — no codecs in this environment
    var sum = 0L
    var min = 256L
    var max = -1L
    var i = 0
    while (i < m.payload.length) {
      val b = (m.payload(i) & 0xff).toLong
      sum += b; if (b < min) min = b; if (b > max) max = b
      i += 1
    }
    val n = m.payload.length.toLong
    val avg =
      if (n == 0) 0.0
      else BigDecimal(sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    MediaFeatures(m.doc_id, m.media_type, n, avg,
      if (n == 0) 0L else min, if (n == 0) 0L else max)
  }

  /** Feature extraction over all media items via mapPartitions — one
    * iterator per partition (vectorized-decoder batch shape), typed
    * Dataset in/out, no shuffle. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items: Dataset[MediaItem] =
      mediaTable(spark, dir)
        .select($"doc_id", $"media_type", $"payload")
        .as[MediaItem]
    items.mapPartitions(_.map(decodeStub)).toDF()
      .orderBy($"doc_id")
  }

  /** Oracle mirror of the stub: per-char codepoint stats (the corpus is
    * pure ASCII, so codepoint == byte). */
  def decodeFeaturesOracleSql: String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    list_transform(generate_series(1, length(text)), i -> ascii(substring(text, i, 1))) AS cps
       |  FROM documents)
       |SELECT doc_id, media_type,
       |  CAST(len(cps) AS BIGINT) AS feat_len,
       |  round(CAST(list_reduce(list_prepend(0, cps), (a, b) -> a + b) AS DOUBLE)
       |    / greatest(len(cps), 1), 6) AS avg_byte,
       |  CAST(coalesce(list_min(cps), 0) AS BIGINT) AS min_byte,
       |  CAST(coalesce(list_max(cps), 0) AS BIGINT) AS max_byte
       |FROM c ORDER BY doc_id""".stripMargin
}
