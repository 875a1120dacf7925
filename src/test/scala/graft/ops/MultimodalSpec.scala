package graft.ops

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("inventory groups the three media types with positive sizes") {
    val rows = Multimodal.inventory(spark, sf()).collect()
    assert(rows.map(_.getAs[String]("media_type")).toSeq ==
      Seq("audio", "image", "video"))
    assert(rows.forall(_.getAs[Long]("total_bytes") > 0))
    val img = rows.find(_.getAs[String]("media_type") == "image").get
    assert(img.getAs[Long]("total_pixels") > 0)
    val vid = rows.find(_.getAs[String]("media_type") == "video").get
    assert(vid.getAs[Long]("total_frames") > 0)
  }

  test("video frame sampling keeps every 4th frame at fixed size") {
    val rows = Multimodal.videoFrames(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("frame_idx") % 4 == 0))
    assert(rows.forall { r =>
      val l = r.getAs[Long]("frame_len"); l > 0 && l <= Multimodal.FrameBytes
    })
  }

  test("audio windowing derives the window length from row metadata") {
    val rows = Multimodal.audioWindows(spark, sf()).collect()
    assert(rows.nonEmpty)
    // mono (160-sample) and stereo (80-sample) windows both occur
    assert(rows.map(_.getAs[Long]("channels")).distinct.sorted.toSeq == Seq(1L, 2L))
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, ws) =>
      val wl = (ws.head.getAs[Long]("rate") / 100) / ws.head.getAs[Long]("channels")
      // every window except the trailing remainder is exactly wl samples
      val full = ws.count(_.getAs[Long]("n_samples") == wl)
      assert(full >= ws.length - 1, s"expected ≥${ws.length - 1} full windows")
      assert(ws.map(_.getAs[Long]("window_idx")).sorted.toSeq ==
        (0L until ws.length).toSeq) // contiguous indices
    }
  }

  test("image resize emits fixed-size thumbnails for every image doc") {
    val rows = Multimodal.imageResize(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("thumb_len") == Multimodal.ThumbSamples))
    assert(rows.forall(r => r.getAs[Long]("out_w") == 8 &&
      r.getAs[Long]("out_h") == 8))
    // content-addressed: distinct docs give (almost always) distinct thumbs
    assert(rows.map(_.getAs[String]("thumb_md5")).distinct.length > rows.length / 2)
  }

  test("decode features route image/audio through the real codecs") {
    val rows = Multimodal.decodeFeatures(spark, sf()).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val mn = r.getAs[Long]("min_val"); val mx = r.getAs[Long]("max_val")
      val avg = r.getAs[Double]("avg_val")
      mn <= mx && avg >= mn && avg <= mx && r.getAs[Long]("feat_len") > 0
    })
    // image features come from the decoded P6 sample plane (bytes)
    assert(rows.filter(_.getAs[String]("media_type") == "image").forall { r =>
      r.getAs[Long]("min_val") >= 0 && r.getAs[Long]("max_val") <= 255
    })
    // audio features come from decoded PCM16 — signed, beyond byte range
    val audio = rows.filter(_.getAs[String]("media_type") == "audio")
    assert(audio.exists(_.getAs[Long]("min_val") < 0),
      "decoded PCM16 must surface negative samples")
    // video stays the documented byte-level stub over ASCII payloads
    assert(rows.filter(_.getAs[String]("media_type") == "video").forall { r =>
      r.getAs[Long]("min_val") >= 32 && r.getAs[Long]("max_val") <= 126
    })
  }

  test("WAV parser decodes hand-built real bytes, header fields included") {
    // 44-byte canonical header written out LITERALLY (not via
    // wavEncode) so the parser is checked against the RIFF spec, not
    // against its own encoder: 8000 Hz mono PCM16, four samples
    // [100, -100, 32767, -32768].
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val bytes =
      "RIFF".getBytes("US-ASCII") ++ le32(36 + 8) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(8) ++
      le16(100) ++ le16(0xff9c) ++ le16(0x7fff) ++ le16(0x8000)
    val (rate, ch, samples) = Multimodal.wavDecode(bytes)
    assert(rate == 8000 && ch == 1)
    assert(samples.toSeq == Seq[Short](100, -100, 32767, -32768))
    // extra chunk before data is walked over, not misread as samples
    val withJunk = bytes.take(12) ++
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII") ++
      bytes.drop(12)
    assert(Multimodal.wavDecode(withJunk)._3.toSeq ==
      Seq[Short](100, -100, 32767, -32768))
    // corrupt magic and truncated data must fail loudly, not zero-fill
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode("JUNK".getBytes("US-ASCII") ++ bytes.drop(4))
    }
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode(bytes.dropRight(3))
    }
  }

  test("WAV encode/decode round-trips and mm_decode_wav matches direct arithmetic") {
    val pcm = Array[Short](0, 1, -1, 12345, -12345, 32767, -32768)
    val (r, c, s) = Multimodal.wavDecode(Multimodal.wavEncode(44100, 2, pcm))
    assert(r == 44100 && c == 2 && s.toSeq == pcm.toSeq)
    val rows = Multimodal.decodeWav(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val frames = (id % 50 + 10).toInt
      val ch = (id % 2 + 1).toInt
      val total = frames * ch
      val sv = (0 until total).map(j => ((id * 31 + j.toLong * 17) % 65536) - 32768)
      assert(row.getAs[Long]("sample_rate") == 8000 * (id % 3 + 1))
      assert(row.getAs[Long]("channels") == ch)
      assert(row.getAs[Long]("n_samples") == total)
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("mean_amp") == r6(sv.sum.toDouble / total))
      assert(row.getAs[Double]("rms") ==
        r6(math.sqrt(sv.map(x => x * x).sum.toDouble / total)))
    }
  }

  test("PPM parser decodes hand-built real bytes, comments and all") {
    // 2x1 image written LITERALLY per the NetPBM spec (not via
    // ppmEncode): comment line inside the header, single newline
    // after maxval, pixels red then mid-gray.
    val bytes = "P6\n2 1\n# a comment\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 128.toByte, 128.toByte, 128.toByte)
    val (w, h, rgb) = Multimodal.ppmDecode(bytes)
    assert(w == 2 && h == 1)
    assert(rgb.map(_ & 0xff).toSeq == Seq(255, 0, 0, 128, 128, 128))
    // corrupt magic, wrong plane size, non-255 maxval: loud failures
    intercept[IllegalArgumentException] {
      Multimodal.ppmDecode("P5".getBytes("US-ASCII") ++ bytes.drop(2))
    }
    intercept[IllegalArgumentException] {
      Multimodal.ppmDecode(bytes.dropRight(1))
    }
    intercept[IllegalArgumentException] {
      Multimodal.ppmDecode(
        "P6\n2 1\n65535\n".getBytes("US-ASCII") ++ bytes.drop(20))
    }
  }

  test("PPM encode/decode round-trips and mm_decode_ppm matches arithmetic") {
    val plane = Array.tabulate(4 * 3 * 3)(k => ((k * 7) % 256).toByte)
    val (w, h, rgb) = Multimodal.ppmDecode(Multimodal.ppmEncode(4, 3, plane))
    assert(w == 4 && h == 3 && rgb.toSeq == plane.toSeq)
    val rows = Multimodal.decodePpm(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w2, h2) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(w2 == id % 8 + 4 && h2 == id % 4 + 3, "header dims round-trip")
      assert(r.getLong(3) == w2 * h2)
      // thumbnail: 2x2 RGB = 12 CSV values, all valid bytes
      val tv = r.getString(8).split(",").map(_.toInt)
      assert(tv.length == 12 && tv.forall(v => v >= 0 && v <= 255))
      // spot-check one thumb byte against the synthesis formula
      val sx = 0L; val sy = 0L
      assert(tv(0) == ((id * 13 + ((sy * w2 + sx) * 3 + 0) * 5) % 256).toInt)
    }
  }

  test("payload dedup matches a Scala recomputation over raw text bytes") {
    val docs = graft.Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy { case (id, _) =>
      Seq("image", "audio", "video")((((id % 3) + 3) % 3).toInt)
    }.map { case (tpe, g) =>
      val distinct = g.map(_._2).distinct.length.toLong
      (tpe, g.length.toLong, distinct,
        math.rint((1.0 - distinct.toDouble / g.length) * 1e6) / 1e6)
    }.toSet
    val got = Multimodal.payloadDedup(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    assert(got.map(_._1) == Set("image", "audio", "video"))
  }
}
