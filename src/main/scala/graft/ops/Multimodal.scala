package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract
  * / frame-sample operators.
  *
  * The container has no codec libraries, so the *general* decode step
  * is a clearly-marked deterministic stub (`decodeStub`) — byte-level
  * features standing in for real pixel/sample decoding — EXCEPT the
  * WAV path (`decodeWav`/`wavDecode`), a real pure-JVM RIFF/WAVE
  * PCM16 parser whose byte-level round trip is oracle-checked
  * (`mm_decode_wav`).  Everything
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

  case class MediaItem(doc_id: Long, media_type: String, payload: Array[Byte],
                       sample_rate: Long, channels: Long)
  case class MediaFeatures(doc_id: Long, media_type: String, feat_len: Long,
                           avg_val: Double, min_val: Long, max_val: Long)

  /** Elementary stream stats over a decoded value sequence — the one
    * feature schema all three media branches share. */
  private def streamFeatures(docId: Long, mediaType: String,
      vals: Iterator[Long]): MediaFeatures = {
    var sum = 0L; var min = Long.MaxValue; var max = Long.MinValue; var n = 0L
    vals.foreach { v =>
      sum += v; if (v < min) min = v; if (v > max) max = v; n += 1
    }
    val avg =
      if (n == 0) 0.0
      else BigDecimal(sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    MediaFeatures(docId, mediaType, n, avg,
      if (n == 0) 0L else min, if (n == 0) 0L else max)
  }

  /** Decode one media item THROUGH THE REAL CODECS (r15 — was a pure
    * byte-level stub):
    *
    *  - image → a genuine P6 stream (same doc_id-deterministic plane
    *    as `mm_decode_ppm`) parsed by [[ppmDecode]]; features over the
    *    decoded RGB sample plane,
    *  - audio → a genuine RIFF/WAVE stream (same doc_id-deterministic
    *    PCM16 as `mm_decode_wav`) parsed by [[wavDecode]]; features
    *    over the decoded sample values,
    *  - video → byte-level features over the raw payload, STILL the
    *    documented stub: there is no pure-JVM video codec in this
    *    container, and `mm_video_frames` already covers the
    *    frame-sampling plumbing.
    *
    * A header misread or endianness bug in either codec shifts every
    * downstream number, and the oracle recomputes expectations from
    * doc_id arithmetic alone — green certifies the decode round trip.
    * The batch shape (partition iterator in, iterator out) is exactly
    * what a real vectorized decoder needs. */
  def decodeReal(m: MediaItem): MediaFeatures = m.media_type match {
    case "image" =>
      val w = (m.doc_id % 8 + 4).toInt
      val h = (m.doc_id % 4 + 3).toInt
      val plane = Array.tabulate(w * h * 3)(k =>
        ((m.doc_id * 13 + k.toLong * 5) % 256).toByte)
      val (_, _, rgb) = ppmDecode(ppmEncode(w, h, plane))
      streamFeatures(m.doc_id, m.media_type,
        rgb.iterator.map(b => (b & 0xff).toLong))
    case "audio" =>
      val frames = (m.doc_id % 50 + 10).toInt
      val total = frames * m.channels.toInt
      val pcm = Array.tabulate(total)(j =>
        (((m.doc_id * 31 + j.toLong * 17) % 65536) - 32768).toShort)
      val (_, _, samples) =
        wavDecode(wavEncode(m.sample_rate.toInt, m.channels.toInt, pcm))
      streamFeatures(m.doc_id, m.media_type, samples.iterator.map(_.toLong))
    case _ => // video: raw payload bytes (documented stub — no codec)
      streamFeatures(m.doc_id, m.media_type,
        m.payload.iterator.map(b => (b & 0xff).toLong))
  }

  /** Feature extraction over all media items via mapPartitions — one
    * iterator per partition (vectorized-decoder batch shape), typed
    * Dataset in/out, no shuffle. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items: Dataset[MediaItem] =
      mediaTable(spark, dir)
        .select($"doc_id", $"media_type", $"payload",
          $"meta.sample_rate".as("sample_rate"),
          $"meta.channels".as("channels"))
        .as[MediaItem]
    items.mapPartitions(_.map(decodeReal)).toDF()
      .orderBy($"doc_id")
  }

  /** Oracle mirror: image/audio expectations from doc_id arithmetic
    * (certifying the engine's codec round trips), video from per-char
    * codepoints (the corpus is pure ASCII, so codepoint == byte). */
  def decodeFeaturesOracleSql: String =
    s"""WITH img AS (
       |  SELECT doc_id, 'image' AS media_type,
       |    list_transform(
       |      generate_series(0, ((doc_id % 8) + 4) * ((doc_id % 4) + 3) * 3 - 1),
       |      k -> (doc_id * 13 + k * 5) % 256) AS vals
       |  FROM documents WHERE doc_id % 3 = 0),
       |aud AS (
       |  SELECT doc_id, 'audio' AS media_type,
       |    list_transform(
       |      generate_series(0, ((doc_id % 50) + 10) * ((doc_id % 2) + 1) - 1),
       |      j -> ((doc_id * 31 + j * 17) % 65536) - 32768) AS vals
       |  FROM documents WHERE doc_id % 3 = 1),
       |vid AS (
       |  SELECT doc_id, 'video' AS media_type,
       |    list_transform(generate_series(1, length(text)),
       |      i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS vals
       |  FROM documents WHERE doc_id % 3 = 2),
       |u AS (SELECT * FROM img UNION ALL SELECT * FROM aud
       |      UNION ALL SELECT * FROM vid)
       |SELECT doc_id, media_type,
       |  CAST(len(vals) AS BIGINT) AS feat_len,
       |  round(CAST(list_reduce(list_prepend(0, vals), (a, b) -> a + b)
       |      AS DOUBLE) / greatest(len(vals), 1), 6) AS avg_val,
       |  CAST(coalesce(list_min(vals), 0) AS BIGINT) AS min_val,
       |  CAST(coalesce(list_max(vals), 0) AS BIGINT) AS max_val
       |FROM u ORDER BY doc_id""".stripMargin

  // ---- real WAV codec (pure JVM, no external libraries) ------------

  case class WavFeatures(doc_id: Long, sample_rate: Long, channels: Long,
      n_samples: Long, duration_ms: Double, mean_amp: Double, rms: Double)

  /** Encode interleaved PCM16 samples as a canonical 44-byte-header
    * RIFF/WAVE byte stream — a REAL (if minimal) encoder: the output
    * plays in any audio tool.  Little-endian throughout, PCM format
    * tag 1, 16 bits/sample. */
  private[ops] def wavEncode(rate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                      // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2)              // byte rate
      .putShort((channels * 2).toShort)         // block align
      .putShort(16.toShort)                     // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE byte stream: validate the RIFF/WAVE magic,
    * walk the chunk list (tolerating extra chunks before/between
    * `fmt ` and `data`, as real encoders emit), require PCM16, and
    * decode the little-endian sample stream.  Fails loudly on
    * malformed input — a decode pipeline must quarantine, not
    * zero-fill, corrupt media.  Returns (rate, channels, samples). */
  private[ops] def wavDecode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF stream")
    bb.getInt() // riff size: trusted no further than the buffer bound
    require(tag() == "WAVE", "RIFF stream is not WAVE")
    var rate = -1; var channels = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (rate < 0 || samples == null)) {
      val id = tag(); val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining(),
        s"chunk '$id' length $len overruns the stream")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fmt = bb.getShort()
          require(fmt == 1, s"not PCM (format tag $fmt)")
          channels = bb.getShort().toInt
          require(channels > 0, s"bad channel count $channels")
          rate = bb.getInt()
          require(rate > 0, s"bad sample rate $rate")
          bb.getInt(); bb.getShort() // byte rate, block align
          val bits = bb.getShort()
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
          bb.position(bb.position() + (len - 16)) // fmt extensions
        case "data" =>
          require(rate > 0, "data chunk before fmt chunk")
          require(len % 2 == 0, s"odd PCM16 data length $len")
          samples = Array.ofDim[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
        case _ => // skip unknown chunk (LIST, INFO, ...)
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk found")
    (rate, channels, samples)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** REAL byte decode over the audio slice: each item's samples are
    * synthesized from its doc_id (deterministic PCM16), encoded into a
    * genuine RIFF/WAVE byte stream, and the features are computed ONLY
    * from what `wavDecode` parses back out of those bytes — header
    * fields included.  A header misread, endianness bug, or chunk-walk
    * error shifts every downstream number, and the oracle recomputes
    * the expected features from doc_id arithmetic alone, so the green
    * check certifies the byte-level round trip end-to-end.  Same
    * `mapPartitions` batch shape as `decodeFeatures` (the stubbed
    * general-codec form): one iterator per partition, typed Dataset
    * in/out, no shuffle; amplitude sums accumulate in exact BIGINTs
    * before the single rounded division. */
  def decodeWav(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter($"media_type" === "audio")
      .select($"doc_id", $"meta.sample_rate".as("rate"),
        $"meta.channels".as("ch"))
      .as[(Long, Long, Long)]
      .mapPartitions(_.map { case (docId, rate, ch) =>
        val frames = (docId % 50 + 10).toInt
        val total = frames * ch.toInt
        val pcm = Array.tabulate(total)(j =>
          (((docId * 31 + j.toLong * 17) % 65536) - 32768).toShort)
        val (dRate, dCh, dSamples) =
          wavDecode(wavEncode(rate.toInt, ch.toInt, pcm))
        var sum = 0L; var sumSq = 0L
        dSamples.foreach { s => sum += s; sumSq += s.toLong * s }
        val n = dSamples.length
        val nFrames = n / dCh
        WavFeatures(docId, dRate.toLong, dCh.toLong, n.toLong,
          r6(nFrames * 1000.0 / dRate),
          r6(sum.toDouble / n),
          r6(math.sqrt(sumSq.toDouble / n)))
      })
      .toDF().orderBy($"doc_id")
  }

  // ---- real PPM (P6) image codec (pure JVM, no external libraries) --

  case class PpmFeatures(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, mean_r: Double, mean_g: Double, mean_b: Double,
      luma: Double, thumb: String)

  /** Encode an RGB byte plane as a binary NetPBM P6 stream — a real
    * encoder: the output opens in any image viewer.  A comment line
    * is emitted on purpose so the parser's comment handling is always
    * exercised by the round trip. */
  private[ops] def ppmEncode(w: Int, h: Int,
      rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"plane ${rgb.length} != ${w}x${h}x3")
    val header = s"P6\n# graft synthetic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a binary NetPBM P6 stream: magic, whitespace/comment-aware
    * header token scan (the format allows `#` comments anywhere in the
    * header), exactly one whitespace byte after maxval, then the raw
    * w·h·3 sample plane.  Fails loudly on malformed input — decode
    * pipelines quarantine corrupt media, they don't zero-fill.
    * Returns (width, height, rgb bytes). */
  private[ops] def ppmDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM stream")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#'-to-end-of-line comments
      var skipping = true
      while (skipping) {
        require(pos < bytes.length, "truncated PPM header")
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else skipping = false
      }
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, s"expected integer at byte $pos")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxv == 255, s"only 8-bit PPM supported, maxval $maxv")
    require(pos < bytes.length, "missing sample plane")
    val sep = bytes(pos)
    require(sep == ' ' || sep == '\n' || sep == '\r' || sep == '\t',
      "missing whitespace after maxval")
    pos += 1 // exactly ONE whitespace byte, per spec — more is data
    val need = w * h * 3
    require(bytes.length - pos == need,
      s"sample plane is ${bytes.length - pos} bytes, expected $need")
    java.util.Arrays.copyOfRange(bytes, pos, bytes.length) match {
      case rgb => (w, h, rgb)
    }
  }

  /** REAL byte decode over the image slice: per item, a small RGB
    * plane is synthesized from doc_id (byte k = (doc_id·13 + k·5) mod
    * 256, dims (doc_id%8+4)×(doc_id%4+3) — deliberately independent of
    * the payload so the operator stays O(1) per row at any corpus
    * scale), encoded into a genuine P6 byte stream, and every output
    * column is computed ONLY from what `ppmDecode` parses back out —
    * dimensions from the header, channel means / integer-weighted luma
    * from the sample plane, and a nearest-neighbor 2×2 thumbnail
    * (srcX = i·w/2, srcY = j·h/2, floor) serialized as CSV so the
    * oracle can rebuild it from arithmetic.  Channel sums accumulate
    * in exact BIGINTs before the single rounded division; same
    * `mapPartitions` batch shape as the WAV path. */
  def decodePpm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter($"media_type" === "image")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map { docId =>
        val w = (docId % 8 + 4).toInt
        val h = (docId % 4 + 3).toInt
        val plane = Array.tabulate(w * h * 3)(k =>
          ((docId * 13 + k.toLong * 5) % 256).toByte)
        val (dw, dh, rgb) = ppmDecode(ppmEncode(w, h, plane))
        val n = dw * dh
        var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
        var p = 0
        while (p < n) {
          val r = rgb(p * 3) & 0xff
          val g = rgb(p * 3 + 1) & 0xff
          val b = rgb(p * 3 + 2) & 0xff
          sr += r; sg += g; sb += b
          sl += 299L * r + 587L * g + 114L * b // integer Rec.601 luma
          p += 1
        }
        val thumb = (for (j <- 0 until 2; i <- 0 until 2; c <- 0 until 3)
          yield {
            val sx = i * dw / 2; val sy = j * dh / 2
            (rgb((sy * dw + sx) * 3 + c) & 0xff).toString
          }).mkString(",")
        PpmFeatures(docId, dw.toLong, dh.toLong, n.toLong,
          r6(sr.toDouble / n), r6(sg.toDouble / n), r6(sb.toDouble / n),
          r6(sl.toDouble / (1000.0 * n)), thumb)
      })
      .toDF().orderBy($"doc_id")
  }

  /** Oracle of `mm_decode_ppm`: features rebuilt from doc_id
    * arithmetic alone — agreement certifies the P6 header walk,
    * comment skip, plane extraction, and thumbnail indexing. */
  def decodePpmOracleSql: String =
    s"""WITH a AS (
       |  SELECT doc_id, (doc_id % 8) + 4 AS w, (doc_id % 4) + 3 AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |px AS (
       |  SELECT doc_id, w, h, w * h AS n,
       |    list_transform(generate_series(0, w * h - 1),
       |      p -> (doc_id * 13 + (p * 3 + 0) * 5) % 256) AS rs,
       |    list_transform(generate_series(0, w * h - 1),
       |      p -> (doc_id * 13 + (p * 3 + 1) * 5) % 256) AS gs,
       |    list_transform(generate_series(0, w * h - 1),
       |      p -> (doc_id * 13 + (p * 3 + 2) * 5) % 256) AS bs
       |  FROM a),
       |s AS (
       |  SELECT doc_id, w, h, n,
       |    list_reduce(list_prepend(0, rs), (x, y) -> x + y) AS sr,
       |    list_reduce(list_prepend(0, gs), (x, y) -> x + y) AS sg,
       |    list_reduce(list_prepend(0, bs), (x, y) -> x + y) AS sb
       |  FROM px),
       |t AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(generate_series(0, 11), q ->
       |      CAST((doc_id * 13 +
       |        ((((q // 6) * h // 2) * w + ((q % 6) // 3) * w // 2) * 3
       |          + q % 3) * 5) % 256 AS VARCHAR)), ',') AS thumb
       |  FROM a)
       |SELECT s.doc_id,
       |  CAST(s.w AS BIGINT) AS width, CAST(s.h AS BIGINT) AS height,
       |  CAST(s.n AS BIGINT) AS n_pixels,
       |  round(CAST(sr AS DOUBLE) / n, 6) AS mean_r,
       |  round(CAST(sg AS DOUBLE) / n, 6) AS mean_g,
       |  round(CAST(sb AS DOUBLE) / n, 6) AS mean_b,
       |  round(CAST(299 * sr + 587 * sg + 114 * sb AS DOUBLE)
       |    / (1000.0 * n), 6) AS luma,
       |  t.thumb
       |FROM s JOIN t ON t.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Oracle of `mm_decode_wav`: the features recomputed from doc_id
    * arithmetic alone — no byte parsing — so engine/oracle agreement
    * proves the encoder+parser round trip preserved every header
    * field and sample. */
  def decodeWavOracleSql: String =
    s"""WITH a AS (
       |  SELECT doc_id,
       |    8000 * (doc_id % 3 + 1) AS rate,
       |    (doc_id % 2) + 1 AS ch,
       |    (doc_id % 50) + 10 AS frames
       |  FROM documents WHERE doc_id % 3 = 1),
       |s AS (
       |  SELECT doc_id, rate, ch, frames, frames * ch AS total,
       |    list_transform(generate_series(0, frames * ch - 1),
       |      j -> ((doc_id * 31 + j * 17) % 65536) - 32768) AS sv
       |  FROM a)
       |SELECT doc_id,
       |  CAST(rate AS BIGINT) AS sample_rate,
       |  CAST(ch AS BIGINT) AS channels,
       |  CAST(total AS BIGINT) AS n_samples,
       |  round(CAST(frames * 1000 AS DOUBLE) / rate, 6) AS duration_ms,
       |  round(CAST(list_reduce(list_prepend(0, sv), (a, b) -> a + b)
       |      AS DOUBLE) / total, 6) AS mean_amp,
       |  round(sqrt(CAST(list_reduce(list_prepend(0, sv),
       |      (a, b) -> a + b * b) AS DOUBLE) / total), 6) AS rms
       |FROM s ORDER BY doc_id""".stripMargin
}
