package graft.ops

import graft.SparkSuite

/** MMR diversified reranking: greedy-selection semantics against a
  * driver-side recomputation, engine-vs-unrolled-SQL parity, and the
  * diversification property itself. */
class MmrSpec extends SparkSuite {

  private lazy val rows =
    Similarity.mmrRerank(spark, sf("sf0.01")).collect()

  test("every query gets MmrK ranked picks with sane scores") {
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to Similarity.MmrK),
        s"query $q ranks")
      // rank 1 is the pure-relevance argmax: its mmr is λ·rel
      val r1 = rs.find(_.getLong(2) == 1L).get
      assert(math.abs(r1.getDouble(4) -
        Similarity.MmrLambda * r1.getDouble(3)) < 2e-6)
      // picks are distinct neighbors
      assert(rs.map(_.getLong(1)).distinct.length == rs.length)
    }
  }

  test("greedy recomputation from the pool matches the engine") {
    // rebuild the greedy selection in plain Scala from the engine's
    // own cached pool + pairwise sims — an independent (driver-side)
    // implementation of the same greedy definition
    val pool = RelationCache.peek(spark, s"mmr_pool:${sf("sf0.01")}").get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ps = RelationCache.peek(spark, s"mmr_psim:${sf("sf0.01")}").get
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    val lam = Similarity.MmrLambda
    val want = pool.groupBy(_._1).flatMap { case (q, cs) =>
      val cands = cs.sortBy(c => (-c._3, c._2))
      var sel = Vector(cands.head._2)
      var out = Vector((q, cands.head._2, 1L))
      for (k <- 2 to Similarity.MmrK) {
        val rem = cands.filterNot(c => sel.contains(c._2))
        if (rem.nonEmpty) {
          val scored = rem.map { c =>
            val ms = sel.map(s => ps((q, c._2, s))).max
            (c._2, lam * c._3 - (1 - lam) * ms)
          }
          val pick = scored.minBy { case (nid, m) => (-m, nid) }
          sel :+= pick._1
          out :+= ((q, pick._1, k.toLong))
        }
      }
      out
    }.toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("engine == unrolled SQL form (the oracle text, run by Spark)") {
    graft.Tables.embeddings(spark, sf("sf0.01"))
      .createOrReplaceTempView("embeddings")
    val sqlForm = spark.sql(Similarity.mmrSql(SparkDialect)).collect()
    assert(rows.toSeq == sqlForm.toSeq)
  }

  test("MMR is not a no-op: some query's picks diverge from top-k") {
    // the operator earns its keep only if the penalty term actually
    // changes selections on real data — membership or ORDER (a pick
    // deferred past a less-similar neighbor counts)
    val pool = RelationCache.peek(spark, s"mmr_pool:${sf("sf0.01")}").get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val diverged = rows.groupBy(_.getLong(0)).exists { case (q, rs) =>
      val mmrIds = rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
      val topIds = pool.filter(_._1 == q).sortBy(c => (-c._3, c._2))
        .take(Similarity.MmrK).map(_._2).toSeq
      mmrIds != topIds
    }
    assert(diverged, "MMR never reordered any query's top-k")
  }
}
