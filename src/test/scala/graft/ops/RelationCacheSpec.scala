package graft.ops

import graft.SparkSuite
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo lifecycle: one cache() per (session, key),
  * deterministic release via clear, and the hot-gram guard count
  * memoized per (posting relation, cap) so repeat cap invocations run
  * zero extra jobs. */
class RelationCacheSpec extends SparkSuite {
  import spark.implicits._

  test("cached memoizes one instance per key and clear releases it") {
    val a = RelationCache.cached(spark, "rc_spec_a") {
      Seq(1, 2, 3).toDF("x")
    }
    val b = RelationCache.cached(spark, "rc_spec_a") {
      fail("build must not run twice for a memoized key")
    }
    assert(a eq b)
    a.count()
    assert(a.storageLevel != StorageLevel.NONE)
    RelationCache.clear(spark)
    assert(a.storageLevel == StorageLevel.NONE, "clear unpersists")
    val rebuilt = RelationCache.cached(spark, "rc_spec_a") {
      Seq(4).toDF("x")
    }
    assert(!(rebuilt eq a), "cleared keys rebuild")
    RelationCache.clear(spark)
  }

  test("cachedScalar memoizes derived values and clear invalidates them") {
    var builds = 0
    def build(): java.lang.Integer = { builds += 1; Integer.valueOf(7) }
    assert(RelationCache.cachedScalar(spark, "rc_scalar")(build()) == 7)
    assert(RelationCache.cachedScalar(spark, "rc_scalar")(build()) == 7)
    assert(builds == 1, "second lookup must not rebuild")
    RelationCache.clear(spark)
    assert(RelationCache.cachedScalar(spark, "rc_scalar")(build()) == 7)
    assert(builds == 2, "clear releases derived scalars too")
    RelationCache.clear(spark)
  }

  test("capPostings runs the broadcast guard count once per (relation, cap)") {
    val posts = Seq.tabulate(40)(i => (i.toLong, 5L, s"g${i % 4}"))
      .toDF("doc_id", "ng", "gram")
    TextOps.clearHotMemo(spark)
    val before = TextOps.hotGuardCounts.get()
    val (cold1, hot1) = TextOps.capPostings(posts, 3)
    assert(TextOps.hotGuardCounts.get() == before + 1)
    cold1.count(); hot1.count()
    // second invocation over the same relation+cap: no new guard job
    val (cold2, hot2) = TextOps.capPostings(posts, 3)
    assert(TextOps.hotGuardCounts.get() == before + 1,
      "the sized hot side is memoized — no second count job")
    cold2.count(); hot2.count()
    // a different cap is a different decision: counts again
    TextOps.capPostings(posts, 5)
    assert(TextOps.hotGuardCounts.get() == before + 2)
    // clearing the memo forces a fresh count (regenerated-relation hook)
    TextOps.clearHotMemo(spark)
    TextOps.capPostings(posts, 3)
    assert(TextOps.hotGuardCounts.get() == before + 3)
    TextOps.clearHotMemo(spark)
  }

  test("capped results are identical across memoized re-invocations") {
    val posts = Seq.tabulate(60)(i => (i.toLong % 10, 6L, s"w${i % 6}"))
      .toDF("doc_id", "ng", "gram")
    TextOps.clearHotMemo(spark)
    val r1 = TextOps.capPostings(posts, 5)._1.collect().map(_.toSeq).toSet
    val r2 = TextOps.capPostings(posts, 5)._1.collect().map(_.toSeq).toSet
    assert(r1 == r2)
    TextOps.clearHotMemo(spark)
  }
}
