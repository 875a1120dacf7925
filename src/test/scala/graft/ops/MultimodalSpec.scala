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

  test("decode stub emits byte-level features over the full corpus") {
    val rows = Multimodal.decodeFeatures(spark, sf()).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val mn = r.getAs[Long]("min_byte"); val mx = r.getAs[Long]("max_byte")
      val avg = r.getAs[Double]("avg_byte")
      mn >= 32 && mx <= 126 && avg >= mn && avg <= mx &&
        r.getAs[Long]("feat_len") > 0
    })
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
