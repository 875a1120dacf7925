package graft.ops

import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {

  test("token counts cover every doc with sane values") {
    val rows = TextAnalysis.tokenCounts(spark, sf()).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val ws = r.getAs[Long]("n_ws_tokens")
      val bpe = r.getAs[Long]("n_bpe_tokens")
      val norm = r.getAs[Long]("n_norm_tokens")
      ws > 0 && bpe >= ws && norm > 0
    })
  }

  test("quality scores are bounded [0, 1] with consistent ratios") {
    val rows = TextAnalysis.quality(spark, sf()).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val q = r.getAs[Double]("quality_score")
      val sym = r.getAs[Double]("symbol_ratio")
      val dig = r.getAs[Double]("digit_ratio")
      val stop = r.getAs[Double]("stopword_ratio")
      q >= 0 && q <= 1 && sym >= 0 && sym <= 1 &&
        dig >= 0 && dig <= 1 && stop >= 0 && stop <= 1
    })
  }

  test("language id predicts a known tag with hit support") {
    val rows = TextAnalysis.langId(spark, sf()).collect()
    assert(rows.length == 500)
    val tags = Set("en", "es", "fr", "de", "und")
    assert(rows.forall(r => tags(r.getAs[String]("pred_lang"))))
    assert(rows.forall { r =>
      (r.getAs[String]("pred_lang") == "und") ==
        (r.getAs[Long]("best_hits") == 0L)
    })
  }

  test("fingerprints are stable, in-range, and order-sensitive") {
    val a = TextAnalysis.fingerprint(spark, sf()).collect()
    val b = TextAnalysis.fingerprint(spark, sf()).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // deterministic
    assert(a.forall { r =>
      val fp = r.getAs[Long]("doc_fp"); fp >= 0 && fp < TextOps.P
    })
    // distinct docs should (overwhelmingly) have distinct fingerprints
    assert(a.map(_.getAs[Long]("doc_fp")).distinct.length > 490)
  }
}
