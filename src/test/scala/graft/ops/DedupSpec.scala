package graft.ops

import graft.SparkSuite
import graft.Tables

class DedupSpec extends SparkSuite {

  test("exact dedup maps every doc to a representative") {
    val df = Dedup.exact(spark, sf()).collect()
    assert(df.length == 500)
    assert(df.forall(r => r.getAs[Long]("rep_doc_id") <= r.getAs[Long]("doc_id")))
  }

  test("ngram jaccard finds the planted near-dup pairs") {
    val rows = Dedup.ngramJaccard(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(rows.forall(r =>
      r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b")))
  }

  test("cross-source matrix counts hand-computed digest pairs") {
    import spark.implicits._
    Seq(
      (1L, "s1", "Same  Content"),  // normalization: case + whitespace
      (2L, "s1", "same content"),
      (3L, "s2", "same content"),
      (4L, "s2", "other thing"),
      (5L, "s2", "other thing"),
      (6L, "s3", "unique text"))
      .toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
    val got = spark.sql(Dedup.crossSourceSql(SparkDialect)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // digest X: s1 x2, s2 x1 -> within s1 C(2,2)=1, cross s1-s2 2*1=2
    // digest Y: s2 x2 -> within s2 C(2,2)=1; s3's unique doc -> no row
    assert(got == Map(
      ("s1", "s1") -> ((1L, 1L)),
      ("s1", "s2") -> ((1L, 2L)),
      ("s2", "s2") -> ((1L, 1L))))
  }

  test("cross-source pair mass equals the exact-dedup group combinatorics") {
    // total dup pairs in the matrix == sum over digest groups of
    // C(group_size, 2) — the matrix is a partition of the same pairs
    val matrixPairs = Dedup.crossSource(spark, sf()).collect()
      .map(_.getAs[Long]("dup_pairs")).sum
    val groups = Dedup.exact(spark, sf()).collect()
      .map(r => (r.getAs[Long]("rep_doc_id"), r.getAs[Long]("group_size")))
      .distinct
    val groupPairs = groups.map { case (_, gs) => gs * (gs - 1) / 2 }.sum
    assert(matrixPairs == groupPairs)
    // and the matrix is empty exactly when no digest group has >= 2
    // members (the sf0.001 fixture plants no exact duplicates; the
    // synthetic corpus above proves the nonzero path)
    assert((matrixPairs > 0) == groups.exists(_._2 > 1))
  }

  test("minhash LSH recovers the same verified pairs as exact ngram jaccard") {
    // Banded candidate generation + exact verify should find the same
    // J >= 0.5 pairs as the exact blocked all-pairs scan (the planted
    // dups have J ~ 0.9, where 8x4 banding recall is ~1 - 3e-4).
    val mh = Dedup.minhashLsh(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
    val ng = Dedup.ngramJaccard(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
    assert(mh == ng)
    val est = Dedup.minhashLsh(spark, sf()).collect()
      .map(_.getAs[Double]("est_sim"))
    assert(est.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("banded simhash equals brute-force all-pairs (completeness <= hd 5)") {
    Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val banded = Dedup.simhash(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = spark.sql(Dedup.simhashBruteSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
    assert(banded.forall(_._3 <= TextOps.SimHashMaxHamming))
  }

  test("clusters are closed over the pair graph with min-id representatives") {
    val pairs = Dedup.simhash(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.simhashClusters(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every pair endpoint is clustered, and paired docs share a rep
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split")
    }
    // the representative is the minimum member of its cluster
    clusters.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
      // cluster_size is consistent across members
      assert(members.values.map(_._2).toSet == Set(members.size.toLong))
    }
  }

  test("LSH-blocked embedding near-dup is a subset of exact with equal cosines") {
    val exact = Dedup.embeddingCosine(spark, sf()).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b")) ->
        r.getAs[Double]("cosine")).toMap
    val lsh = Dedup.embeddingLsh(spark, sf()).collect()
    lsh.foreach { r =>
      val k = (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"))
      assert(exact.contains(k))
      assert(exact(k) == r.getAs[Double]("cosine"))
    }
  }

  test("corpus-scaled embedding LSH is a subset of exact with equal cosines") {
    val exact = Dedup.embeddingCosine(spark, sf()).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b")) ->
        r.getAs[Double]("cosine")).toMap
    val lsh = Dedup.embeddingLshScaled(spark, sf()).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"))
      assert(exact.contains(k))
      assert(exact(k) == r.getAs[Double]("cosine"))
    }
  }

  test("engine scaled-LSH DataFrame plan equals its SQL formulation") {
    // The serving query computes the banded signature once (cached
    // emb_band_keys relation); the SQL text — which the DuckDB oracle
    // runs — re-derives it per band when inlined.  Same rows, same
    // cosines, bit for bit.
    val fast = Dedup.embeddingLshScaled(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    Tables.embeddings(spark, sf()).createOrReplaceTempView("embeddings")
    val sql = spark.sql(Dedup.embeddingLshScaledSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fast.nonEmpty && fast == sql)
  }

  test("scaled embedding LSH never loses exact duplicates as bands narrow") {
    // Double the sf0.001 corpus (500 → 1000 vectors, copies at
    // vec_id + 10000): n/32 > 16 pushes the scaled band width past the
    // fixed grid's 4 bits.  Identical vectors share EVERY band key at
    // any width, so all 500 (i, i+10000) cosine-1.0 pairs must
    // survive — the recall floor of the narrowing tradeoff.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    base.union(base.withColumn("vec_id", col("vec_id") + lit(10000L)))
      .createOrReplaceTempView("embeddings")
    val got = spark.sql(Dedup.embeddingLshScaledSql(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b"))).toSet
    val n = base.count()
    val dupPairs = base.select($"vec_id").as[Long].collect()
      .map(i => (i, i + 10000L)).toSet
    assert(n == 500L && dupPairs.subsetOf(got))
  }

  test("LSH recall report counts agree with the operators it summarizes") {
    val r = Dedup.lshRecall(spark, sf()).collect()(0)
    val exact = Dedup.embeddingCosine(spark, sf()).count()
    val lsh = Dedup.embeddingLsh(spark, sf()).count()
    val scaled = Dedup.embeddingLshScaled(spark, sf()).count()
    assert(r.getAs[Long]("exact_pairs") == exact)
    assert(r.getAs[Long]("lsh_pairs") == lsh)
    assert(r.getAs[Long]("scaled_pairs") == scaled)
    val lr = r.getAs[Double]("lsh_recall")
    val sr = r.getAs[Double]("scaled_recall")
    assert(lr > 0.0 && lr <= 1.0 && sr > 0.0 && sr <= 1.0)
  }

  test("embedding cosine near-dup pairs are in range and deduped") {
    val rows = Dedup.embeddingCosine(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cosine"); c >= 0.4 - 1e-9 && c <= 1.0 + 1e-9
    })
  }

  test("dedup report agrees with the exact dedup it summarizes") {
    val report = Dedup.report(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = Dedup.exact(spark, sf()).collect()
    assert(report.values.map(_._1).sum == exact.length)
    assert(report.values.map(_._2).sum ==
      exact.count(_.getAs[Boolean]("is_duplicate")))
    // per-source totals match the raw table
    val docs = graft.Tables.documents(spark, sf()).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.view.mapValues(_._1).toMap == docs)
  }

  test("semantic dedup clusters and drops as hand-computed on one-hot seeds") {
    import spark.implicits._
    // 8 one-hot centroids (pairwise cos 0 < 0.4 → never drop each
    // other) + two vectors leaning hard on axis 0: both assign to
    // cluster 0 and both have lower-id near-dup mates there
    val dim = 8
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val lean = Array.tabulate(dim)(j =>
      if (j == 0) 0.9f else if (j == 1) 0.1f else 0f)
    val lean2 = Array.tabulate(dim)(j =>
      if (j == 0) 0.95f else if (j == 2) 0.05f else 0f)
    ((0 until 8).map(i => i.toLong -> oneHot(i)) ++
      Seq(8L -> lean, 9L -> lean2))
      .toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    val got = spark.sql(Dedup.semanticSql(SparkDialect)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expected = (1L to 7L).map(_ -> ((1L, 0L, 1L))).toMap +
      (0L -> ((3L, 2L, 1L)))
    assert(got == expected)
  }

  test("semantic dedup engine path equals the dialect-shared SQL form") {
    val engine = Dedup.semantic(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    graft.Tables.embeddings(spark, sf()).createOrReplaceTempView("embeddings")
    val sql = spark.sql(Dedup.semanticSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(engine == sql)
  }

  test("semantic dedup is consistent with the exact all-pairs baseline") {
    val summary = Dedup.semantic(spark, sf()).collect()
    val total = summary.map(_.getAs[Long]("n_vecs")).sum
    assert(total == graft.Tables.embeddings(spark, sf()).count())
    assert(summary.forall(r =>
      r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_vecs")))
    // blocking can only LOSE pairs vs the exact baseline: the count of
    // dropped vectors is bounded by the distinct higher-id members of
    // exact near-dup pairs
    val exactDroppable = Dedup.embeddingCosine(spark, sf()).collect()
      .map(_.getAs[Long]("vec_id_b")).toSet
    assert(summary.map(_.getAs[Long]("n_dropped")).sum <= exactDroppable.size)
  }

  test("scaled semantic dedup: invariants hold and it matches its SQL form") {
    val rows = Dedup.semanticScaled(spark, sf()).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      graft.Tables.embeddings(spark, sf()).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_vecs"))
      if (r.getAs[Long]("is_capped") == 1L) {
        val n = r.getAs[Long]("n_vecs")
        assert(r.getAs[Long]("n_dropped") == 0L,
          "a capped cluster defers, it does not silently drop")
        assert(r.getAs[Long]("capped_pairs") == n * (n - 1) / 2,
          "capped_pairs must be the exact forgone pair mass")
      } else assert(r.getAs[Long]("capped_pairs") == 0L)
    }
    // engine path ≡ the dialect-shared SQL form (the oracle's text)
    graft.Tables.embeddings(spark, sf()).createOrReplaceTempView("embeddings")
    val sql = spark.sql(Dedup.semanticScaledSql(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet == sql)
  }

  test("scaled semantic dedup caps an adversarial giant cluster") {
    import spark.implicits._
    // ~185 vectors piled on axis 0 (one giant semantic cluster) with
    // the √n SEED positions (vec_id ≡ 0 mod stride=14 for n=200)
    // occupied by one-hot outliers on other axes — so Lloyd cannot
    // split the pile across many near-identical seeds, and it
    // converges into ONE oversized cluster.  Without the cap that
    // cluster would pair ~C(185,2); with it the cluster is excluded,
    // reported exactly, and the outliers still dedup normally.
    val dim = Similarity.KmeansDim // the trained chain is dim-pinned
    def v(axis: Int, jitterAxis: Int, jitter: Float): Array[Float] =
      Array.tabulate(dim)(j =>
        if (j == axis) 1f else if (j == jitterAxis) jitter else 0f)
    val vecs = (0 until 200).map { i =>
      if (i % 14 == 0) (i.toLong, v(1 + (i / 14) % 7, 0, 0f)) // seed slot
      else (i.toLong, v(0, 1 + i % 7, 0.01f * (i % 5)))       // the pile
    }
    val dir = java.nio.file.Files.createTempDirectory("sem_scaled").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Dedup.semanticScaled(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 200L)
    val capped = rows.filter(_.getAs[Long]("is_capped") == 1L)
    assert(capped.nonEmpty, "the giant cluster must trip the cap: " +
      rows.map(r => (r.getLong(0), r.getLong(1))).mkString(","))
    val giant = capped.maxBy(_.getAs[Long]("n_vecs"))
    val gn = giant.getAs[Long]("n_vecs")
    assert(gn >= 100L, s"expected the axis-0 pile to dominate, got $gn")
    assert(giant.getAs[Long]("capped_pairs") == gn * (gn - 1) / 2)
    // bounded work: every UNCAPPED cluster's population respects the cap
    // implied by the reported relation (mult * n / k)
    val k = rows.length.toLong
    val cap = math.ceil(Dedup.SemanticCapMult * 200.0 / k).toLong
    rows.filter(_.getAs[Long]("is_capped") == 0L).foreach(r =>
      assert(r.getAs[Long]("n_vecs") <= cap))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("token-weighted dedup report matches an independent Scala recomputation") {
    val docs = graft.Tables.documents(spark, sf())
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // same normalization/keeper rule, recomputed without SQL: group by
    // the normalized text itself (equivalent to grouping by its md5)
    val keeper = docs.groupBy(_._3.trim.toLowerCase.replaceAll("\\s+", " "))
      .values.flatMap { g =>
        val rep = g.map(_._1).min
        g.map(d => d._1 -> (d._1 == rep))
      }.toMap
    def tok(t: String): Long = t.trim.split("\\s+").count(_.nonEmpty).toLong
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val total = g.map(d => tok(d._3)).sum
      val kept = g.filter(d => keeper(d._1)).map(d => tok(d._3)).sum
      (src, total, kept,
        math.rint((1.0 - kept.toDouble / total) * 1e6) / 1e6)
    }.toSet
    val got = Dedup.reportTokens(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    // consistency with the doc-level report: a source with duplicate
    // DOCS must lose token mass, and a dup-free source must not
    val docDups = Dedup.report(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_dup_docs")).toMap
    got.foreach { case (src, _, _, frac) =>
      assert((frac > 0) == (docDups(src) > 0), s"source $src")
    }
  }

  test("token report: a source of only empty docs yields NULL frac, not 0/0") {
    import spark.implicits._
    // sum(n_tok) = 0 for this source; the CASE guard must make BOTH
    // dialects return NULL rather than Spark-NULL-vs-DuckDB-NaN.
    Seq((1L, "empty_src", ""), (2L, "empty_src", "   \t  "),
        (3L, "real_src", "some actual tokens here"))
      .toDF("doc_id", "source", "text")
      .createOrReplaceTempView("documents")
    val rows = spark.sql(Dedup.reportTokensSql(SparkDialect))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.isNullAt(3))).toMap
    assert(rows("empty_src") == ((0L, true)),
      "zero token mass: dup_token_frac is NULL")
    assert(rows("real_src")._1 == 4L && !rows("real_src")._2)
  }
}
