package graft.ops

import graft.SparkSuite

/** Edge-case behavior of the dialect-generated text operators on
  * degenerate documents: empty, whitespace-only, punctuation-only,
  * single-word, and sub-shingle-length texts must flow through without
  * errors and with sensible values. */
class TextEdgeCaseSpec extends SparkSuite {

  private def withDocs(rows: Seq[(Long, String)])(body: => Unit): Unit = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("documents")
    body
  }

  private val edgeDocs = Seq(
    0L -> "",
    1L -> "   ",
    2L -> "!!! ... ???",
    3L -> "word",
    4L -> "two words",
    5L -> "the quick brown fox jumps over the lazy dog")

  test("token counts handle empty and degenerate docs") {
    withDocs(edgeDocs) {
      val rows = spark.sql(TextAnalysis.tokenCountsSql(SparkDialect))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(rows(0L) == ((0L, 0L, 0L)))
      assert(rows(1L) == ((0L, 0L, 0L)))
      assert(rows(2L)._3 == 0L) // punctuation-only: no normalized tokens
      assert(rows(3L) == ((1L, 1L, 1L)))
      assert(rows(5L)._1 == 9L)
    }
  }

  test("digit and symbol ratios count the right character classes") {
    // regression: lenMinus('[^0-9]') counted NON-digits — every score
    // collapsed to 0 because digit_ratio read 1.0 on a digit-free corpus
    withDocs(Seq(0L -> "abc 123 def!", 1L -> "no digits here")) {
      val rows = spark.sql(TextAnalysis.qualitySql(SparkDialect))
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Double]("symbol_ratio"), r.getAs[Double]("digit_ratio"),
            r.getAs[Double]("quality_score"))).toMap
      val (sym0, dig0, _) = rows(0L)
      assert(dig0 == 0.25, s"digit_ratio $dig0") // '123' of 12 chars
      assert(sym0 == 0.083333, s"symbol_ratio $sym0") // the '!', round(1/12, 6)
      val (sym1, dig1, q1) = rows(1L)
      assert(dig1 == 0.0 && sym1 == 0.0)
      assert(q1 > 0.0) // a clean doc must not score zero
    }
  }

  test("quality scoring never divides by zero") {
    withDocs(edgeDocs) {
      val rows = spark.sql(TextAnalysis.qualitySql(SparkDialect)).collect()
      assert(rows.length == edgeDocs.length)
      rows.foreach { r =>
        val q = r.getAs[Double]("quality_score")
        assert(!q.isNaN && q >= 0.0 && q <= 1.0)
      }
    }
  }

  test("fingerprints of sub-window docs fall back to the full-doc hash") {
    withDocs(edgeDocs) {
      val rows = spark.sql(TextAnalysis.fingerprintSql(SparkDialect))
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("doc_fp"), r.getAs[Long]("win_fp"))).toMap
      assert(rows(0L)._1 == 0L) // empty doc: fold over empty = init
      // docs shorter than the 8-token window: win_fp == doc_fp
      assert(rows(3L)._1 == rows(3L)._2)
      assert(rows(4L)._1 == rows(4L)._2)
      // the 9-token doc has real windows
      assert(rows(5L)._1 >= 0L && rows(5L)._2 >= 0L)
    }
  }

  test("dedup pipelines ignore docs with no shingles") {
    withDocs(edgeDocs) {
      val ngram = spark.sql(Dedup.ngramJaccardSql(SparkDialect)).collect()
      // only doc 5 has >= 3 tokens; no pair can form
      assert(ngram.isEmpty)
      val exact = spark.sql(Dedup.exactSql(SparkDialect)).collect()
      assert(exact.length == edgeDocs.length) // exact dedup keeps all
    }
  }

  test("repetition drops token-less docs; dup spans keeps them at zero") {
    withDocs(edgeDocs) {
      val rep = spark.sql(TextAnalysis.repetitionSql(SparkDialect)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // docs with no normalized tokens (0, 1, 2) have no word rows to
      // aggregate — they fall out of the output on BOTH engines (the
      // inner join is the shared semantics), never divide by zero
      assert(rep.keySet == Set(3L, 4L, 5L))
      assert(rep(3L) == 1L && rep(4L) == 2L && rep(5L) == 9L)
      val spans = spark.sql(TextAnalysis.dupSpansSql(SparkDialect)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
      // dup spans LEFT JOINs from the full doc list: every doc appears,
      // sub-8-token docs at (0 spans, 0.0)
      assert(spans.keySet == edgeDocs.map(_._1).toSet)
      assert(edgeDocs.map(_._1).filter(_ != 5L)
        .forall(id => spans(id) == ((0L, 0.0))))
      assert(spans(5L)._1 == 2L) // 9 tokens → 2 span positions
    }
  }

  test("langid marks hit-less docs as undetermined") {
    withDocs(edgeDocs) {
      val rows = spark.sql(TextAnalysis.langIdSql(SparkDialect))
        .collect().map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
      assert(rows(0L) == "und")
      assert(rows(2L) == "und")
      assert(rows(5L) == "en") // 'the' ×2 + 'over'... stopword hits
    }
  }
}
