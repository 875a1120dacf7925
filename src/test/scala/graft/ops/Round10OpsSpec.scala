package graft.ops

import graft.SparkSuite

/** Independent verification of the round-10 additions: passage-level
  * BM25, the temperature-scaled mixture, and cluster-balanced
  * sampling — each recomputed in plain Scala from the raw fixture
  * tables (third implementation besides engine and DuckDB oracle). */
class Round10OpsSpec extends SparkSuite {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def tokensByDoc: Map[Long, Seq[String]] = {
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    spark.sql("SELECT doc_id, graft_tokens(text) AS toks FROM documents")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1))
      .toMap
  }

  test("chunk-level BM25 matches an independent in-memory recomputation") {
    val w = TextAnalysis.ChunkWindow
    val s = TextAnalysis.ChunkWindow - TextAnalysis.ChunkOverlap
    val chunks: Seq[((Long, Long), Seq[String])] =
      tokensByDoc.toSeq.flatMap { case (d, ts) =>
        val nc = if (ts.size <= w) 1 else 1 + (ts.size - w + s - 1) / s
        (0 until nc).map(ci => (d, ci.toLong) -> ts.slice(ci * s, ci * s + w))
      }
    val n = chunks.size.toDouble
    val avgdl = chunks.map(_._2.size.toLong).sum.toDouble / chunks.size
    val tf = chunks.flatMap { case (key, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (key, t, xs.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val idfU = df.map { case (t, f) =>
      t -> math.round(math.log(1.0 + (n - f + 0.5) / (f + 0.5)) * 1e6)
    }
    val dl = chunks.map { case (key, ts) => key -> ts.size.toDouble }.toMap
    val qs = Retrieval.QueryTerms.toSet
    val scores = tf.filter(x => qs(x._2)).groupBy(_._1).map { case (key, xs) =>
      val su = xs.map { case (_, t, f) =>
        math.round(idfU(t).toDouble * (f * (Retrieval.K1 + 1.0)) /
          (f + Retrieval.K1 *
            (1.0 - Retrieval.B + Retrieval.B * dl(key) / avgdl)))
      }.sum
      (key, xs.size.toLong, su)
    }.toSeq
    val expTop = scores
      .sortBy { case ((d, c), _, su) => (-su, d, c) }.take(10)
    val got = Retrieval.chunkBm25(spark, sf()).collect()
    assert(got.length == expTop.length)
    got.zip(expTop).zipWithIndex.foreach {
      case ((r, ((d, c), nh, su)), i) =>
        assert(r.getAs[Long]("rank") == i + 1)
        assert(r.getAs[Long]("doc_id") == d)
        assert(r.getAs[Long]("chunk_id") == c)
        assert(r.getAs[Long]("n_hit_terms") == nh)
        assert(math.abs(r.getAs[Double]("bm25") - su / 1e6) < 1e-6)
    }
  }

  test("temperature mixture matches independent shares and caps rates") {
    val toks = tokensByDoc
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val langOf = spark.sql("SELECT doc_id, lang FROM documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val langTokens = toks.toSeq
      .groupBy { case (d, _) => langOf(d) }
      .map { case (l, xs) => l -> xs.map(_._2.size.toLong).sum }
    val total = langTokens.values.sum
    val alpha = TextAnalysis.MixtureAlpha
    val wU = langTokens.map { case (l, nt) =>
      val lnQ = math.round(math.log(nt.toDouble / total) * 1e6) / 1e6
      l -> math.round(math.exp(alpha * lnQ) * 1e6)
    }
    val tw = wU.values.sum.toDouble
    val got = TextAnalysis.mixtureTemperature(spark, sf()).collect()
    assert(got.map(_.getAs[String]("lang")).toSeq ==
      langTokens.keys.toSeq.sorted)
    got.foreach { r =>
      val l = r.getAs[String]("lang")
      assert(r.getAs[Long]("lang_tokens") == langTokens(l))
      val expShare = wU(l) / tw
      assert(math.abs(r.getAs[Double]("temp_share") - expShare) < 1e-6)
      val expRate = math.min(1.0, total / 2.0 * expShare / langTokens(l))
      assert(math.abs(r.getAs[Double]("sample_rate") - expRate) < 1e-5)
      assert(r.getAs[Double]("sample_rate") <= 1.0)
    }
    // temperature flattens: every below-natural-share language gains
    val shares = got.map(r => (r.getAs[Double]("natural_share"),
      r.getAs[Double]("temp_share")))
    shares.filter(_._1 < shares.map(_._1).max).foreach { case (nat, tmp) =>
      assert(tmp >= nat - 1e-9,
        s"tail language lost share under temperature: $nat -> $tmp")
    }
  }

  test("quality classifier matches an independent in-memory GD recomputation") {
    val toks = tokensByDoc
    graft.Tables.documents(spark, sf()).createOrReplaceTempView("documents")
    val langOf = spark.sql("SELECT doc_id, lang FROM documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val b = Retrieval.DsirBuckets
    val docs = toks.filter(_._2.nonEmpty).toSeq.map { case (id, ts) =>
      val tf = ts.groupBy(t => h60(t) % b)
        .map { case (fb, xs) => fb -> xs.size.toLong }
      (id, if (langOf(id) == "en") 1000000L else 0L, ts.size.toLong, tf)
    }
    val n = docs.size.toLong
    // BigDecimal HALF_UP = round half away from zero — the semantics
    // of SQL round() in BOTH engines (negative residual halves must
    // round down, where Scala's math.round would round toward +inf)
    def grad(rU: Map[Long, Long]): Map[Long, Long] =
      docs.flatMap { case (id, _, nTok, tf) =>
        tf.map { case (fb, f) =>
          fb -> BigDecimal(rU(id).toDouble * f / nTok)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
      }.groupBy(_._1).map { case (fb, xs) => fb -> xs.map(_._2).sum }
    def pU(sU: Long, nTok: Long): Long =
      BigDecimal(1e6 / (1.0 + math.exp(-(sU.toDouble / (nTok * 1e6)))))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var w = Map.empty[Long, Long]
    var rU = docs.map { case (id, yU, _, _) => id -> (yU - 500000L) }.toMap
    for (_ <- 1 to Retrieval.ClfEpochs) {
      val g = grad(rU)
      w = g.map { case (fb, gv) =>
        fb -> (w.getOrElse(fb, 0L) +
          BigDecimal(gv.toDouble * Retrieval.ClfLr / n)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
      rU = docs.map { case (id, yU, nTok, tf) =>
        val sU = tf.map { case (fb, f) => w.getOrElse(fb, 0L) * f }.sum
        id -> (yU - pU(sU, nTok))
      }.toMap
    }
    val probs = docs.map { case (id, _, nTok, tf) =>
      val sU = tf.map { case (fb, f) => w.getOrElse(fb, 0L) * f }.sum
      (id, pU(sU, nTok))
    }
    val byLang = probs.groupBy { case (id, _) => langOf(id) }
    val got = Retrieval.qualityClassifier(spark, sf()).collect()
    assert(got.map(_.getAs[String]("lang")).toSeq == byLang.keys.toSeq.sorted)
    got.foreach { r =>
      val l = r.getAs[String]("lang")
      val ps = byLang(l).map(_._2)
      assert(r.getAs[Long]("n_docs") == ps.size.toLong)
      assert(math.abs(r.getAs[Double]("mean_prob")
        - ps.sum.toDouble / (ps.size * 1e6)) < 1e-6)
      assert(r.getAs[Long]("n_above") == ps.count(_ > 500000L).toLong)
    }
    // the trained model separates the classes: the target slice's
    // mean probability strictly exceeds every other language's
    val meanOf = got.map(r =>
      r.getAs[String]("lang") -> r.getAs[Double]("mean_prob")).toMap
    meanOf.filter(_._1 != "en").values.foreach(m =>
      assert(meanOf("en") > m,
        s"classifier failed to separate: en=${meanOf("en")} vs $m"))
  }

  test("IVF-ADC scores match an independent PQ reconstruction recompute") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        expr(SparkDialect.toDoubleArr("embedding")).as("v"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val m = Similarity.PqM; val sd = Similarity.PqSubDim
    val k = Similarity.PqK
    val stride = (emb.length + k - 1) / k
    val seeds = emb.zipWithIndex.collect {
      case ((_, v), r) if r % stride == 0 => (r / stride, v)
    }
    def cw(s: Int, j: Int): Array[Double] =
      seeds.find(_._1 == j).get._2.slice(s * sd, s * sd + sd)
    def codesOf(v: Array[Double]): Array[Int] =
      (0 until m).map { s =>
        val sub = v.slice(s * sd, s * sd + sd)
        (0 until seeds.length).minBy { j =>
          val c = cw(s, j)
          (dot(sub, sub) - 2 * dot(sub, c) + dot(c, c), j)
        }
      }.toArray
    def uq(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecOf = emb.toMap
    val got = Similarity.ivfAdc(spark, sf()).collect()
    assert(got.nonEmpty)
    // every query returns a dense rank 1..k sequence
    got.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
    // every reported score is the PQ-reconstruction cosine, recomputed
    // from raw embeddings + the sampled codebook independently
    got.foreach { r =>
      val q = vecOf(r.getAs[Long]("query_id"))
      val n = vecOf(r.getAs[Long]("neighbor_id"))
      val codes = codesOf(n)
      val ipU = (0 until m).map(s =>
        uq(dot(q.slice(s * sd, s * sd + sd), cw(s, codes(s))))).sum
      val nrm2U = (0 until m).map(s =>
        uq(dot(cw(s, codes(s)), cw(s, codes(s))))).sum
      val cs = (ipU / 1e6) /
        (math.sqrt(dot(q, q)) * math.sqrt(nrm2U / 1e6))
      assert(math.abs(r.getAs[Double]("approx_cosine") - cs) < 2e-6,
        s"row $r expected $cs")
    }
  }

  test("trained IVFPQ matches an independent per-subspace Lloyd recompute") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        expr(SparkDialect.toDoubleArr("embedding")).as("v"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def uq(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val m = Similarity.PqM; val sd = Similarity.PqSubDim
    val k = Similarity.PqK
    val stride = (emb.length + k - 1) / k
    // cb: Map[(s, j) -> codeword]
    var cb: Map[(Int, Long), Array[Double]] =
      emb.zipWithIndex.collect {
        case ((_, v), r) if r % stride == 0 =>
          (0 until m).map(s =>
            (s, (r / stride).toLong) -> v.slice(s * sd, s * sd + sd))
      }.flatten.toMap
    def assign(cbNow: Map[(Int, Long), Array[Double]])
        : Map[(Long, Int), Long] =
      emb.flatMap { case (id, v) =>
        (0 until m).map { s =>
          val sub = v.slice(s * sd, s * sd + sd)
          val j = cbNow.keys.filter(_._1 == s).map(_._2).toSeq.sorted
            .minBy { j =>
              val c = cbNow((s, j))
              (dot(sub, sub) - 2 * dot(sub, c) + dot(c, c), j)
            }
          (id, s) -> j
        }
      }.toMap
    for (_ <- 1 to Similarity.PqIters) {
      val a = assign(cb)
      cb = a.toSeq.groupBy { case ((_, s), j) => (s, j) }
        .map { case ((s, j), members) =>
          val subs = members.map { case ((id, _), _) =>
            emb.find(_._1 == id).get._2.slice(s * sd, s * sd + sd) }
          val cnt = subs.size
          (s, j) -> (0 until sd).map(d =>
            subs.map(x => uq(x(d))).sum.toDouble / (1e6 * cnt)).toArray
        }
    }
    val codes = assign(cb)
    val vecOf = emb.toMap
    val got = Similarity.ivfAdcTrained(spark, sf()).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = vecOf(r.getAs[Long]("query_id"))
      val nid = r.getAs[Long]("neighbor_id")
      val ipU = (0 until m).map(s =>
        uq(dot(q.slice(s * sd, s * sd + sd), cb((s, codes((nid, s))))))).sum
      val nrm2U = (0 until m).map { s =>
        val c = cb((s, codes((nid, s)))); uq(dot(c, c))
      }.sum
      val cs = (ipU / 1e6) /
        (math.sqrt(dot(q, q)) * math.sqrt(nrm2U / 1e6))
      assert(math.abs(r.getAs[Double]("approx_cosine") - cs) < 2e-6,
        s"row $r expected $cs")
    }
  }

  test("cluster-balanced sample takes min(size, quota) lowest-hash members") {
    import spark.implicits._
    val sample = Similarity.clusterSample(spark, sf()).collect()
    // reload the assignment exactly as the engine serves it
    val asgn = spark.table("asgn").as[(Long, Long)].collect()
    val n = asgn.length.toLong
    val k = asgn.map(_._2).distinct.length.toLong
    val q = (n + 5 * k - 1) / (5 * k)
    val byCluster = asgn.groupBy(_._2)
    val expected = byCluster.toSeq.flatMap { case (cid, xs) =>
      xs.map(_._1).sortBy(v => (h60(s"${v}_cbs"), v)).take(q.toInt)
        .zipWithIndex.map { case (v, i) => (cid, v, i + 1L) }
    }.toSet
    assert(sample.length == expected.size)
    sample.foreach { r =>
      assert(expected((r.getAs[Long]("cid"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("pick_rank"))))
    }
    // every cluster contributes exactly min(size, quota)
    val perCluster = sample.groupBy(_.getAs[Long]("cid"))
    byCluster.foreach { case (cid, xs) =>
      assert(perCluster(cid).length == math.min(xs.length.toLong, q))
    }
  }
}
