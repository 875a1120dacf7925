package graft.ops

import graft.SparkSuite

/** Independent verification of the retrieval & data-selection wing:
  * every score is recomputed in plain Scala from the raw fixture
  * tables (own md5/h60, own BM25/DSIR arithmetic) and compared against
  * the SQL operators — a third implementation besides engine and
  * DuckDB oracle. */
class RetrievalSpec extends SparkSuite {

  private def tokensByDoc: Map[Long, Seq[String]] = {
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    spark.sql("SELECT doc_id, graft_tokens(text) AS toks FROM documents")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1))
      .toMap
  }

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("bm25 top-10 matches an independent in-memory BM25") {
    val toks = tokensByDoc
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / toks.size
    val tf = toks.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (d, t, xs.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val idfU = df.map { case (t, f) =>
      t -> math.round(math.log(1.0 + (n - f + 0.5) / (f + 0.5)) * 1e6)
    }
    val qs = Retrieval.QueryTerms.toSet
    val scores = tf.filter(x => qs(x._2)).groupBy(_._1).map { case (d, xs) =>
      val dl = toks(d).size.toDouble
      val su = xs.map { case (_, t, f) =>
        math.round(idfU(t).toDouble * (f * (Retrieval.K1 + 1.0)) /
          (f + Retrieval.K1 * (1.0 - Retrieval.B + Retrieval.B * dl / avgdl)))
      }.sum
      (d, xs.size.toLong, su)
    }.toSeq
    val expTop = scores.sortBy { case (d, _, su) => (-su, d) }.take(10)
    val got = Retrieval.bm25(spark, sf()).collect()
    assert(got.length == 10)
    got.zip(expTop).zipWithIndex.foreach { case ((r, (d, nh, su)), i) =>
      assert(r.getAs[Long]("rank") == i + 1)
      assert(r.getAs[Long]("doc_id") == d)
      assert(r.getAs[Long]("n_hit_terms") == nh)
      assert(math.abs(r.getAs[Double]("bm25") - su / 1e6) < 1e-6)
    }
  }

  test("hybrid RRF fuses consistently and vector ranks match brute force") {
    // independent vector ranking from the raw embeddings
    val emb = graft.Tables.embeddings(spark, sf()).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vrank: Map[(Long, Long), Long] = emb.keys.filter(_ % 100 == 0).flatMap { q =>
      emb.keys.filter(_ != q).toSeq
        .map(nid => (nid, math.rint(cos(emb(q), emb(nid)) * 1e6) / 1e6))
        .sortBy { case (nid, cs) => (-cs, nid) }
        .zipWithIndex.map { case ((nid, _), i) => (q, nid) -> (i + 1).toLong }
    }.toMap
    val rows = Retrieval.hybridRrf(spark, sf()).collect()
    val qids = rows.map(_.getAs[Long]("query_id")).distinct.sorted
    assert(qids.nonEmpty && qids.forall(_ % 100 == 0))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length == Retrieval.TopK)
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      // fused scores are non-increasing in rank
      val ss = sorted.map(_.getAs[Double]("rrf_score"))
      assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        val vr = Option(r.getAs[Any]("vec_rank")).map(_.asInstanceOf[Long])
        val lr = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long])
        // retrieved by at least one modality, at fused depth
        assert(vr.nonEmpty || lr.nonEmpty)
        assert(vr.forall(_ <= Retrieval.FuseDepth))
        assert(lr.forall(_ <= Retrieval.FuseDepth))
        // the fused score is exactly the µ-quantized RRF of the ranks
        val exp = (vr.map(v => math.round(1e6 / (Retrieval.RrfK + v))).getOrElse(0L)
          + lr.map(l => math.round(1e6 / (Retrieval.RrfK + l))).getOrElse(0L)) / 1e6
        assert(math.abs(r.getAs[Double]("rrf_score") - exp) < 1e-9)
        // vector ranks agree with the independent brute-force ranking
        vr.foreach(v => assert(
          vrank((q, r.getAs[Long]("neighbor_id"))) == v,
          s"q=$q n=${r.getAs[Long]("neighbor_id")}"))
      }
    }
  }

  test("dsir weights match an independent hashed-ngram likelihood ratio") {
    val toks = tokensByDoc
    val docs = graft.Tables.documents(spark, sf())
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long](0) -> r.getAs[String](1)).toMap
    val b = Retrieval.DsirBuckets
    val feats = toks.map { case (d, ts) => d -> ts.map(t => h60(t) % b) }
    val ct = feats.toSeq.filter(x => docs(x._1) == "en")
      .flatMap(_._2).groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
    val cr = feats.toSeq.flatMap(_._2).groupBy(identity)
      .map { case (f, xs) => f -> xs.size.toLong }
    val nt = ct.values.sum.toDouble
    val nr = cr.values.sum.toDouble
    val lamU = cr.map { case (f, c) =>
      f -> math.round((math.log((ct.getOrElse(f, 0L) + 1.0) / (nt + b))
        - math.log((c + 1.0) / (nr + b))) * 1e6)
    }
    val got = Retrieval.dsirWeights(spark, sf()).collect()
    assert(got.length == toks.size)
    got.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val ts = feats(d)
      assert(r.getAs[Long]("n_tokens") == ts.size)
      val exp = ts.map(lamU).sum.toDouble / (1e6 * ts.size)
      assert(math.abs(r.getAs[Double]("dsir_logratio") - exp) < 1e-6, s"doc $d")
    }
    // the weights separate the target: mean weight of en docs exceeds
    // the mean over the rest (that is the entire point of DSIR)
    val (en, rest) = got.partition(r => docs(r.getAs[Long]("doc_id")) == "en")
    def mean(xs: Array[org.apache.spark.sql.Row]): Double =
      xs.map(_.getAs[Double]("dsir_logratio")).sum / xs.length
    assert(mean(en) > mean(rest))
  }

  test("ANN-fused hybrid keeps the fusion arithmetic exact") {
    val rows = Retrieval.hybridRrfAnn(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.length == Retrieval.TopK)
      rs.foreach { r =>
        val vr = Option(r.getAs[Any]("vec_rank")).map(_.asInstanceOf[Long])
        val lr = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long])
        assert(vr.nonEmpty || lr.nonEmpty)
        val exp = (vr.map(v => math.round(1e6 / (Retrieval.RrfK + v))).getOrElse(0L)
          + lr.map(l => math.round(1e6 / (Retrieval.RrfK + l))).getOrElse(0L)) / 1e6
        assert(math.abs(r.getAs[Double]("rrf_score") - exp) < 1e-9)
      }
    }
    // the lexical side is identical across variants: any pair ranked
    // by BOTH variants' lexical modality carries the same lex_rank
    val lex = Retrieval.hybridRrf(spark, sf()).collect()
      .flatMap(r => Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long])
        .map((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> _))
      .toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long]).foreach { lr =>
        lex.get(k).foreach(expected => assert(expected == lr))
      }
    }
  }

  test("hybrid recall is the exact top-k overlap of the two variants") {
    val ex = Retrieval.hybridRrf(spark, sf()).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val an = Retrieval.hybridRrfAnn(spark, sf()).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = Retrieval.hybridRecall(spark, sf()).collect()
    assert(got.map(_.getAs[Long]("query_id")).toSet == ex.map(_._1))
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val expected = ex.filter(_._1 == q).count(an.contains)
      assert(r.getAs[Long]("n_common") == expected)
      assert(math.abs(r.getAs[Double]("recall_frac")
        - expected.toDouble / Retrieval.TopK) < 1e-9)
    }
  }

  test("sampled hybrid recall equals the full harness restricted to the sample") {
    // Per-query rankings are independent, so the sampled harness must
    // reproduce the full harness's rows verbatim for the sampled ids —
    // the invariant that makes the sampled variant a valid stand-in at
    // scaling fixtures where the full harness cannot run.
    val full = Retrieval.hybridRecall(spark, sf()).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("recall_frac")))).toMap
    val got = Retrieval.hybridRecallSampled(spark, sf()).collect()
    val nq = full.size
    assert(got.length == math.ceil(math.sqrt(nq.toDouble)).toLong)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(full.contains(q))
      assert(full(q) ==
        ((r.getAs[Long]("n_common"), r.getAs[Double]("recall_frac"))))
    }
  }

  test("sampled harness is identical on its standalone and derived paths") {
    // hybridRecallSampled serves its ground truth from the cached FULL
    // rank relation when the full harness already ran this session
    // (derive-from-superset) and from its own √|Q|·n sampled build when
    // not (the scaling-fixture path, full harness excluded).  Both
    // paths must produce bit-identical rows.
    RelationCache.clear(spark)
    val standalone = Retrieval.hybridRecallSampled(spark, sf()).collect()
      .map(_.toSeq).toSeq
    RelationCache.clear(spark)
    Retrieval.hybridRecall(spark, sf()).collect() // populates hybrid_vtop
    assert(RelationCache.peek(spark, s"hybrid_vtop:${sf()}").isDefined)
    val derived = Retrieval.hybridRecallSampled(spark, sf()).collect()
      .map(_.toSeq).toSeq
    assert(standalone.nonEmpty && standalone == derived)
  }

  test("dsir resampling applies the exact acceptance coin per doc") {
    val weights = Retrieval.dsirWeights(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_logratio"))
    val langs = graft.Tables.documents(spark, sf())
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long](0) -> r.getAs[String](1)).toMap
    val kept = weights.map { case (d, w) =>
      // the operator quantizes exp BEFORE the coin; mirror it
      val pU = math.min(1000000L, math.round(math.exp(w) * 1e6))
      (langs(d), if (h60(s"${d}_dsir") % 1000000L < pU) 1L else 0L)
    }
    val exp = kept.groupBy(_._1).map { case (l, xs) =>
      l -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val got = Retrieval.dsirSample(spark, sf()).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, k) = exp(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_kept") == k, s"lang ${r.getAs[String]("lang")}")
      assert(math.abs(r.getAs[Double]("keep_frac")
        - math.rint(k.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
  }

  test("corpus stats roll up exactly to the raw counts") {
    val docs = graft.Tables.documents(spark, sf())
      .select("doc_id", "source", "lang").collect()
    val toks = tokensByDoc
    val rows = Retrieval.corpusStats(spark, sf()).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r).toMap
    // one row per source, one per lang, one grand total
    val srcs = docs.map(_.getAs[String]("source")).distinct
    val langs = docs.map(_.getAs[String]("lang")).distinct
    assert(rows.size == srcs.length + langs.length + 1)
    srcs.foreach { s =>
      val ids = docs.filter(_.getAs[String]("source") == s).map(_.getAs[Long]("doc_id"))
      val r = rows((s, "<all>"))
      assert(r.getAs[Long]("n_docs") == ids.length)
      assert(r.getAs[Long]("total_tokens") == ids.map(toks(_).size.toLong).sum)
    }
    val tot = rows(("<all>", "<all>"))
    assert(tot.getAs[Long]("n_docs") == docs.length)
    assert(tot.getAs[Double]("dup_frac") >= 0.0 && tot.getAs[Double]("dup_frac") < 1.0)
  }

  test("k-anonymity classes partition the corpus with exact counts") {
    val docs = graft.Tables.documents(spark, sf()).collect()
    val toks = tokensByDoc
    val classes = docs.groupBy { r =>
      (r.getAs[String]("source"), r.getAs[String]("lang"),
        toks(r.getAs[Long]("doc_id")).size / 32)
    }.map { case (_, xs) => xs.length }
    val rows = Retrieval.kAnonymity(spark, sf()).collect()
    // class counts roll up to the corpus; per-source figures exact
    assert(rows.map(_.getAs[Long]("n_classes")).sum == classes.size)
    val bySource = docs.groupBy(_.getAs[String]("source"))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val cls = bySource(src).groupBy { x =>
        (x.getAs[String]("lang"), toks(x.getAs[Long]("doc_id")).size / 32)
      }.map(_._2.length)
      assert(r.getAs[Long]("n_classes") == cls.size)
      assert(r.getAs[Long]("min_class_size") == cls.min)
      assert(r.getAs[Long]("n_small_classes") == cls.count(_ < 5))
      assert(r.getAs[Long]("n_at_risk") == cls.filter(_ < 5).sum)
    }
  }

  test("cluster purity covers every vector with exact ratios") {
    val nVec = graft.Tables.embeddings(spark, sf()).count()
    val rows = Similarity.clusterPurity(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("cluster_size")).sum == nVec)
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      val mj = r.getAs[Long]("majority_n")
      assert(mj >= 1 && mj <= sz)
      val exp = math.rint(mj.toDouble / sz * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("purity") - exp) < 1e-9)
      val lbl = r.getAs[Int]("majority_label")
      assert(lbl >= 0 && lbl <= 9)
    }
  }
}
