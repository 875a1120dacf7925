package graft.ops

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the two-phase distributed union-find must agree with
  * a single-threaded reference union-find on arbitrary random graphs —
  * regardless of how Spark partitions the edges.  Fixed ScalaCheck
  * seeds keep runs reproducible. */
class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def referenceCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
  }

  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L) // self-loops allowed — must be handled
    } yield (a, b))

  test("distributed CC equals reference union-find on random graphs") {
    (1 to 8).foreach { i =>
      val edges = graphGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val df = edges.toDF("a", "b").repartition(5) // force multi-partition
      val got = Dedup.connectedComponents(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = referenceCC(edges)
      assert(got.keySet == want.keySet, s"seed $i node set")
      want.foreach { case (n, rep) =>
        assert(got(n)._1 == rep, s"seed $i node $n")
      }
      want.groupBy(_._2).foreach { case (rep, members) =>
        assert(got(rep)._2 == members.size.toLong, s"seed $i cluster $rep")
      }
    }
  }
}
