package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.ops.TextOps

/** Property tests for the native sketch/aggregate primitives against
  * brute-force reference implementations — pure JVM, no Spark session,
  * so they cover many random inputs cheaply.  Seeded generation (same
  * pattern as AsofPropertySpec) keeps runs deterministic. */
class NativeFunctionPropertySpec extends AnyFunSuite {

  private val token: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val tokens: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, token))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t =>
      UTF8String.fromString(t).asInstanceOf[Any]).toArray)

  private def h60(s: String): Long =
    GraftH60.h60(UTF8String.fromString(s))

  test("graft_simhash equals the brute-force per-bit sum") {
    (1 to 200).foreach { i =>
      val ts = sample(tokens, i.toLong)
      val got = Option(GraftSimHash.compute(arr(ts))).map(_.longValue())
      if (ts.isEmpty) assert(got.isEmpty)
      else {
        val sums = new Array[Long](60)
        ts.foreach { t =>
          val h = h60(t)
          (0 until 60).foreach(j => sums(j) += 2 * ((h >> j) & 1L) - 1)
        }
        val want = (0 until 60)
          .map(j => if (sums(j) > 0) 1L << j else 0L).sum
        assert(got.contains(want), s"seed $i")
      }
    }
  }

  test("graft_minhash equals brute-force permutation minima") {
    (1 to 200).foreach { i =>
      val ts = sample(tokens, 1000L + i)
      val got = Option(GraftMinHash.compute(arr(ts)))
        .map(_.toLongArray().toSeq)
      if (ts.isEmpty) assert(got.isEmpty)
      else {
        val want = (0 until TextOps.NumPerms).map { k =>
          ts.map { t =>
            val g = h60(t) % TextOps.P
            (TextOps.permA(k) * g + TextOps.permB(k)) % TextOps.P
          }.min
        }
        assert(got.contains(want), s"seed $i")
      }
    }
  }

  test("graft_shingles3 equals the sliding-window distinct set") {
    (1 to 200).foreach { i =>
      val ts = sample(tokens, 2000L + i)
      val got = GraftShingles3.compute(arr(ts)).toArray[UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val want = ts.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq.distinct
      assert(got == want, s"seed $i")
    }
  }

  test("TopKPairs partial-merge equals a global sort-take") {
    val pairs: Gen[List[(Double, Long)]] =
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.choose(-100, 100).map(_.toDouble), Gen.choose(0L, 1000L))))
    val agg = new TopKPairs(5)
    (1 to 200).foreach { i =>
      // distinct pairs: the real query's (price, unique orderkey) shape
      val xs = sample(pairs, 3000L + i).distinct
      val ys = sample(pairs, 4000L + i).distinct.filterNot(xs.contains)
      val b1 = xs.foldLeft(agg.zero)(agg.reduce)
      val b2 = ys.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.finish(agg.merge(b1, b2))
      val mergedFlip = agg.finish(agg.merge(b2, b1))
      val want = (xs ++ ys).sortBy { case (v, id) => (-v, id) }.take(5)
      assert(merged == want, s"seed $i")
      assert(mergedFlip == want, s"merge must commute, seed $i")
    }
  }

  test("graft_top_cids kernel equals a brute-force rank on random codebooks") {
    // The kernel's bounded insertion sort + sentinel handling against
    // an independent recomputation: (cs desc, cid asc) with
    // non-positive norm products pinned below every real cosine.
    // Pure expression-level eval — no Spark session.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val dim = 8
    val vec: Gen[Array[Double]] =
      Gen.listOfN(dim, Gen.choose(-5, 5).map(_.toDouble)).map(_.toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    (1 to 120).foreach { i =>
      val k = 1 + math.abs(sample(Gen.choose(1, 90), 7000L + i))
      val cents = (0 until k).map { j =>
        val cv = sample(vec, 8000L + i * 100 + j)
        // every ~7th centroid is the zero vector (norm 0): the
        // sentinel path must rank it last, ties by cid
        val c = if (j % 7 == 3) Array.fill(dim)(0.0) else cv
        (j.toLong * 2 + 1, c, math.sqrt(dot(c, c)))
      }
      val v = sample(vec, 9000L + i)
      val nrm = math.sqrt(dot(v, v))
      val top = 1 + i % 6
      val expr = GraftTopCids(
        Literal.create(v.toSeq, ArrayType(DoubleType)),
        Literal(nrm),
        Literal.create(cents.map(_._1), ArrayType(LongType)),
        Literal.create(cents.map(_._2.toSeq),
          ArrayType(ArrayType(DoubleType))),
        Literal.create(cents.map(_._3), ArrayType(DoubleType)),
        Literal(top))
      val got = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      val want = cents.map { case (cid, cv, cnrm) =>
        val den = nrm * cnrm
        val cs = if (den > 0) dot(v, cv) / den else -2.0
        (cs, cid)
      }.sortBy { case (cs, cid) => (-cs, cid) }.take(top).map(_._2)
      assert(got == want, s"seed $i k=$k top=$top")
    }
  }
}
