package graft.ops

import graft.SparkSuite

/** Semantic pins for the round-3 extensions.  Per the round-2 lesson,
  * shared-dialect oracles can replicate a bug to both sides, so each
  * operator here is checked against an INDEPENDENT computation
  * (hand-rolled Scala over collected rows, or a differently-shaped
  * Spark query), not just structure. */
class RelationalExtSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  test("q4: semi join equals distinct-join-reduce formulation") {
    import spark.implicits._
    val got = RelationalExt.q4OrderPriority(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // independent shape: inner join + distinct orderkeys, then count
    val ord = graft.Tables.orders(spark, sf())
      .filter($"o_orderdate" >= to_timestamp(lit("1997-07-01")) &&
        $"o_orderdate" < to_timestamp(lit("1997-10-01")))
    val want = ord
      .join(graft.Tables.lineitem(spark, sf()), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate")
      .select($"o_orderkey", $"o_orderpriority").distinct()
      .groupBy($"o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("q15: every returned supplier achieves the maximum revenue") {
    val rows = RelationalExt.q15TopSupplier(spark, sf()).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"mixed revenues: ${revs.toSeq}")
  }

  test("moving-average frame equals a hand-rolled sliding window") {
    val rows = RelationalExt.qMovingAvg(spark, sf()).collect()
    val rev = rows.map(_.getAs[Double]("rev"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 6)
      val frame = rev.slice(lo, i + 1)
      val ma = BigDecimal(frame.sum / frame.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("ma7") - ma) < 1e-9,
        s"row $i: got ${r.getAs[Double]("ma7")}, want $ma")
      val mx = rev.slice(math.max(0, i - 29), i + 1).max
      assert(r.getAs[Double]("max30") == mx, s"row $i max30")
    }
  }

  test("ntile quartiles are 1..4 and monotone in price within customer") {
    val rows = RelationalExt.qNtileLag(spark, sf()).collect()
    assert(rows.forall { r =>
      val q = r.getAs[Long]("price_quartile"); q >= 1 && q <= 4
    })
    // within a customer, sorting by price must sort quartiles too
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val byPrice = rs.sortBy(r =>
        (r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
      val qs = byPrice.map(_.getAs[Long]("price_quartile"))
      assert(qs.sameElements(qs.sorted))
    }
  }

  test("percentiles match hand-computed linear interpolation") {
    val rows = RelationalExt.qPercentiles(spark, sf()).collect()
    val li = graft.Tables.lineitem(spark, sf())
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    def interp(v: Array[Double], q: Double): Double = {
      val pos = (v.length - 1) * q
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < v.length) v(lo) + frac * (v(lo + 1) - v(lo)) else v(lo)
    }
    rows.foreach { r =>
      val v = li(r.getString(0)).toArray
      Seq(("p25_price", 0.25), ("median_price", 0.5), ("p75_price", 0.75))
        .foreach { case (c, q) =>
          assert(math.abs(r.getAs[Double](c) - interp(v, q)) < 1e-3,
            s"$c for ${r.getString(0)}")
        }
    }
  }

  test("bloom semi join equals the plain exact semi join") {
    import spark.implicits._
    val got = RelationalExt.qBloomSemiJoin(spark, sf()).collect()
      .map(_.toSeq).toSeq
    val urgent = graft.Tables.orders(spark, sf())
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val want = graft.Tables.lineitem(spark, sf())
      .join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice"), 2).as("sum_price"))
      .orderBy($"l_returnflag").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("gapfill: contiguous per-key calendar, ffill carries last value") {
    val rows = RelationalExt.qGapfill(spark, sf()).collect()
    rows.groupBy(_.getAs[String]("sym")).foreach { case (sym, rs) =>
      val days = rs.map(_.getAs[java.sql.Timestamp]("day").getTime).sorted
      // contiguous daily grid
      days.sliding(2).foreach { case Array(a, b) =>
        assert(b - a == 86400000L, s"$sym gap")
      case _ => ()
      }
      // forward fill: value changes only on observed days
      val ordered = rs.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
      var last = Double.NaN
      ordered.foreach { r =>
        val v = r.getAs[Double]("v_filled")
        if (!r.getAs[Boolean]("observed"))
          assert(v == last, s"$sym unobserved day must carry last value")
        last = v
      }
    }
  }

  test("unpivot doubles the row count and preserves sums") {
    import spark.implicits._
    val part = graft.Tables.part(spark, sf())
    val got = RelationalExt.qUnpivot(spark, sf()).collect()
    assert(got.map(_.getAs[Long]("n")).sum == 2 * part.count())
    val sumRetail = got.filter(_.getAs[String]("attr") == "p_retailprice")
      .map(_.getAs[Double]("sum_value")).sum
    val want = part.agg(round(sum($"p_retailprice"), 2)).head.getDouble(0)
    assert(math.abs(sumRetail - want) < 1.0)
  }

  test("array stats agree with a per-row Scala computation") {
    val rows = RelationalExt.qArrayStats(spark, sf()).collect()
    val vecs = graft.Tables.embeddings(spark, sf())
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("n_pos") == v.count(_ > 0.0))
      assert(math.abs(r.getAs[Double]("max_c") - v.max) < 1e-6)
      assert(math.abs(r.getAs[Double]("mean_c") - v.sum / v.length) < 1e-6)
      assert(math.abs(r.getAs[Double]("l2_norm") -
        math.sqrt(v.map(x => x * x).sum)) < 1e-6)
    }
  }

  test("tfidf: top terms are ranked, unique terms beat common terms") {
    val rows = TextAnalysis.tfidf(spark, sf()).collect()
    // per doc: ranks are 1..k with strictly descending-or-tie order
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length.toLong).toSeq)
      val scores = byRank.map(_.getAs[Double]("tfidf"))
      scores.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ => ()
      }
    }
    // a term appearing in every doc has idf 0 → can never out-rank a
    // term with positive idf unless everything ties at 0
    assert(rows.forall(_.getAs[Double]("tfidf") >= 0.0))
  }

  test("pack sequences equal a hand-rolled cumulative-budget packing") {
    val budget = 2048L
    val got = TextAnalysis.packSequences(spark, sf()).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[Long]("pack_id")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))).toMap
    // independent recomputation from raw token counts
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val docs = spark.sql(
      """SELECT doc_id, lang, size(graft_tokens(text)) AS n
        |FROM documents""".stripMargin).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Int]("n").toLong))
    val want = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        cum += n
        (lang, (cum - 1) / budget, id, n)
      }.groupBy { case (_, pack, _, _) => pack }
        .map { case (pack, members) =>
          ((lang, pack), (members.length.toLong, members.map(_._4).sum,
            members.map(_._3).min, members.map(_._3).max))
        }
    }
    assert(got == want)
    assert(got.values.map(_._1).sum == 500L)
  }

  test("weighted sample keeps exactly the docs whose salted hash clears the score") {
    import org.apache.spark.unsafe.types.UTF8String
    val got = TextAnalysis.weightedSample(spark, sf()).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // independent recomputation: quality scores from the quality
    // operator, hash decision re-derived in plain Scala
    val docs = graft.Tables.documents(spark, sf())
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val scores = TextAnalysis.quality(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality_score")))
    val want = scores.groupBy { case (id, _) => docs(id) }.map { case (lang, ss) =>
      val kept = ss.count { case (id, score) =>
        val h = graft.functions.GraftH60.h60(
          UTF8String.fromString(id.toString + "_ws"))
        // same grid snap as the shared SQL fragment: round-half-up to
        // the integer, never IEEE truncation (Spark CAST truncates,
        // DuckDB CAST rounds — round(x, 0) agrees in both)
        (h % 1000000) < Math.round(score * 1000000)
      }
      lang -> (ss.length.toLong, kept.toLong)
    }
    assert(got == want)
    // the sampler must actually discriminate: some kept, some dropped
    assert(got.values.map(_._2).sum > 0)
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum)
  }

  test("weighted-sample threshold snaps boundary-landing scores to the grid") {
    // Multiplying an on-grid score (round(x, 6) of something) by 1e6
    // is NOT always exact in IEEE doubles — ~23k of the 1e6+1 grid
    // values miss the intended integer, and ~11.5k land BELOW it
    // (0.000249 * 1e6 = 248.99999999999997), where a truncating cast
    // (Spark CAST) yields k-1 but a rounding cast (DuckDB CAST) yields
    // k.  The explicit round(x, 0) is therefore load-bearing ON-grid,
    // not just for off-grid doubles.  Assert the engine's
    // round()-based threshold expression equals the round-half-up
    // Scala derivation on all boundary scores INCLUDING a divergent
    // grid point, and that bare truncation really does diverge there.
    val boundary =
      Seq(0.29, 0.57, 0.123456, 0.999999, 0.5, 1.0, 0.0, 0.000249)
    val thresholds = spark.sql(
      s"""SELECT s, CAST(round(s * 1000000, 0) AS BIGINT) AS t
         |FROM VALUES ${boundary.map(s => s"(${s}D)").mkString(", ")} AS v(s)"""
        .stripMargin).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    boundary.foreach { s =>
      assert(thresholds(s) == Math.round(s * 1000000), s"score $s")
    }
    // The divergence round(x, 0) guards against is live ON-grid:
    // 0.000249 * 1e6 = 248.99999999999997, so bare truncation yields
    // 248 while round-half-up yields 249 — proof the round() above is
    // necessary, not hygiene.  (Off-grid doubles diverge too:
    // nextDown(0.29) * 1e6 = 289999.99999999994.)
    assert((0.000249 * 1000000).toLong == 248L)
    assert(Math.round(0.000249 * 1000000) == 249L)
    val offGrid = Math.nextDown(0.29)
    assert((offGrid * 1000000).toLong != Math.round(offGrid * 1000000))
  }

  test("contamination: reported docs are non-train with real overlap") {
    import spark.implicits._
    val rows = TextAnalysis.contamination(spark, sf()).collect()
    assert(rows.nonEmpty)
    // split assignment cross-check against the sample-split operator's
    // fragment: recompute the split of each reported doc
    val d = SparkDialect
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val splits = spark.sql(
      s"""SELECT doc_id,
         |  CASE WHEN (${d.h60(d.castStr("doc_id"))} % 100) < 90 THEN 'train'
         |       WHEN (${d.h60(d.castStr("doc_id"))} % 100) < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { r =>
      assert(splits(r.getAs[Long]("doc_id")) != "train")
      assert(splits(r.getAs[Long]("top_train_doc")) == "train")
      assert(r.getAs[Long]("top_shared_grams") >= 3L)
      assert(r.getAs[Long]("n_train_matches") >= 1L)
    }
  }

  test("histogram quantile estimates honor the one-bin-width bound") {
    val rows = RelationalExt.qHistQuantiles(spark, sf()).collect()
    assert(rows.map(_.getAs[Double]("p")).toSeq == Seq(0.5, 0.9, 0.99))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"p=${r.getAs[Double]("p")} err=${r.getAs[Double]("abs_err")}" +
          s" w=${r.getAs[Double]("bin_width")}")
      assert(r.getAs[Double]("abs_err") <= r.getAs[Double]("bin_width"))
      // the exact side agrees with an independent sort-interpolate
      val xs = graft.Tables.load(spark, sf(), "lineitem")
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      val p = r.getAs[Double]("p")
      val rank = p * (xs.length - 1)
      val (i, f) = (rank.toInt, rank - rank.toInt)
      val exact = if (i + 1 < xs.length) xs(i) + f * (xs(i + 1) - xs(i))
                  else xs(i)
      assert(math.abs(r.getAs[Double]("exact") - exact) < 1e-6,
        s"p=$p exact=${r.getAs[Double]("exact")} ref=$exact")
    }
  }
}
