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

  test("iterated contraction: a forest over the stitch threshold forces extra rounds") {
    // A chain of 3-cliques: cluster k = nodes {3k, 3k+1, 3k+2}, plus a
    // bridge edge to the next cluster — one long path-shaped component
    // (worst case for diameter-bound algorithms) of 600 nodes.
    val cliques = (0L until 200L).flatMap { k =>
      val b = 3 * k
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }
    val bridges = (0L until 199L).map(k => (3 * k + 2, 3 * k + 3))
    val edges = (cliques ++ bridges).toDF("a", "b").repartition(32)
      .as[(Long, Long)]

    // threshold far below the phase-1 forest size (≤600 nodes/partition
    // slice, but >50 total) so the loop must contract at least twice
    val (forest, rounds) = Dedup.contractForest(edges, stitchMaxEdges = 50L)
    assert(rounds >= 2, s"expected iterated contraction, got $rounds round(s)")

    val reps = forest.collect().toMap
    assert(reps.keySet == (0L until 600L).toSet)
    assert(reps.values.forall(_ == 0L), "single chain component rooted at 0")

    // and the public operator agrees with the reference regardless of
    // the threshold that drove it
    val got = Dedup.connectedComponents(
        (cliques ++ bridges).toDF("a", "b").repartition(32),
        stitchMaxEdges = 50L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == (0L until 600L).toSet)
    assert(got.values.forall { case (rep, size) => rep == 0L && size == 600L })
  }
}
