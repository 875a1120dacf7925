package graft.ops

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property test: the native streaming-merge as-of operator agrees
  * with an in-memory reference implementation on random inputs —
  * random keys, timestamps (with deliberate collisions), and sides of
  * very different sizes.  Uses fixed ScalaCheck seeds so runs are
  * reproducible. */
class AsofPropertySpec extends SparkSuite {

  private val keyGen = Gen.oneOf("A", "B", "C")
  private val tsGen = Gen.choose(0L, 50L) // small range → collisions
  private val caseGen = Gen.zip(
    Gen.listOfN(30, Gen.zip(keyGen, tsGen, Gen.choose(0, 999))),
    Gen.listOfN(12, Gen.zip(keyGen, tsGen, Gen.choose(0, 999))))

  private def ts(t: Long) = new Timestamp(t * 60000L)

  test("native asof == in-memory reference on random inputs") {
    import spark.implicits._
    (1 to 10).foreach { i =>
      val (ls, rs) = caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      // de-dup right rows on (key, ts): the as-of winner among exact
      // duplicates is order-dependent in any implementation
      val rsu = rs.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = ls.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("sym", "l_ts", "lv")
      val right = rsu.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("sym", "r_ts", "rv")
      val got = Temporal.asofJoinNative(left, right, "sym", "l_ts", "r_ts")
        .collect()
        .map(r => (r.getAs[String]("sym"), r.getAs[Timestamp]("l_ts").getTime,
          r.getAs[Int]("lv"), r.getAs[Timestamp]("r_ts").getTime,
          r.getAs[Int]("rv")))
        .sorted.toSeq
      val expect = ls.flatMap { case (k, lt, lv) =>
        val cands = rsu.filter(r => r._1 == k && r._2 <= lt)
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(_._2)
          Some((k, ts(lt).getTime, lv, ts(best._2).getTime, best._3))
        }
      }.sorted.toSeq
      assert(got == expect, s"seed $i mismatch")
    }
  }
}
