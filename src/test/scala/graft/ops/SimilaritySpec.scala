package graft.ops

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  test("brute-force top-k returns exactly k ranked neighbors per query") {
    val rows = Similarity.topK(spark, sf()).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5) // vec_ids 0,100,200,300,400
    byQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L))
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }) // descending
    }
  }

  test("IVF probes rank candidates with the exact scoring arithmetic") {
    val ivf = Similarity.ivf(spark, sf()).collect()
    assert(ivf.nonEmpty)
    val brute = Similarity.topK(spark, sf()).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    ivf.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 5)
    }
  }

  test("k-means IVF trains centroids deterministically and improves on init") {
    val a = Similarity.ivfKmeans(spark, sf()).collect()
    val b = Similarity.ivfKmeans(spark, sf()).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // no RNG, no order dependence
    assert(a.nonEmpty)
    // trained codebook must actually move: assignments differ from the
    // fixed-centroid variant for at least one (query, rank) slot
    val fixed = Similarity.ivf(spark, sf()).collect().map(_.toSeq).toSet
    assert(a.map(_.toSeq).toSet != fixed)
    // scoring arithmetic is still exact — any pair shared with
    // brute-force carries the identical cosine
    val brute = Similarity.topK(spark, sf()).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    a.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("recall equals an independent Scala recomputation from the result sets") {
    val rec = Similarity.recall(spark, sf()).collect()
    assert(rec.map(_.getAs[Long]("query_id")).toSeq == Seq(0L, 100L, 200L, 300L, 400L))
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val truth = pairs(Similarity.topK(spark, sf()).filter("rank <= 5"))
    val byMethod = Map(
      "recall_lsh" -> pairs(Similarity.annLsh(spark, sf())),
      "recall_ivf" -> pairs(Similarity.ivf(spark, sf())),
      "recall_kmeans" -> pairs(Similarity.ivfKmeans(spark, sf())))
    rec.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_true") == truth(q).size)
      byMethod.foreach { case (col, ann) =>
        val expected = (truth(q) & ann.getOrElse(q, Set.empty)).size.toDouble /
          truth(q).size
        val got = r.getAs[Double](col)
        assert(got == math.rint(expected * 1e6) / 1e6, s"$col for query $q")
        assert(got >= 0.0 && got <= 1.0)
      }
    }
  }

  test("ANN results agree with brute-force cosines on shared pairs") {
    val ann = Similarity.annLsh(spark, sf()).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    assert(ann.nonEmpty)
    val brute = Similarity.topK(spark, sf()).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    ann.keys.filter(brute.contains).foreach { k =>
      assert(ann(k) == brute(k)) // identical scoring arithmetic
    }
  }
}
