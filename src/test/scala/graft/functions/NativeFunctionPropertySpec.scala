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
}
