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
