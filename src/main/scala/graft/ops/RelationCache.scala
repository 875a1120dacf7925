package graft.ops

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for cached derived relations (SimHash pair
  * graph, MinHash gram/signature tables, normalized embeddings).
  *
  * Why not rely on Spark's CacheManager alone: every call that builds
  * the same plan and `.cache()`s it again creates a fresh DataFrame,
  * triggers an "Asked to cache already cached data" warning, and —
  * for relations built through non-deterministic-looking expressions
  * — can pin duplicate cache entries for the life of the session.
  * Memoizing the DataFrame itself makes the reuse explicit: one
  * `.cache()` per (session, key), every consumer shares the same
  * instance, and `clear` gives tests/benchmarks a deterministic
  * unpersist point.
  *
  * The map holds strong references to the sessions it has seen; this
  * process creates O(1) sessions (one per bench/verify/test JVM), so
  * that is bounded by design.
  */
object RelationCache {

  private val memo = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Return the memoized cached relation for `key`, building and
    * `.cache()`-ing it on first use in this session.
    *
    * Deliberately NOT computeIfAbsent: a build function that itself
    * memoizes a child relation (pairs → sig) would re-enter the map
    * mid-update, which ConcurrentHashMap forbids (IllegalStateException
    * "Recursive update" when the keys share a bin).  get-then-putIfAbsent
    * tolerates reentrancy; a lost race leaves a harmless duplicate
    * cache() call (the CacheManager dedupes storage by plan — do not
    * unpersist the loser, that would evict the shared entry). */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (spark, key)
    val existing = memo.get(k)
    if (existing != null) existing
    else {
      val df = build.cache()
      val prev = memo.putIfAbsent(k, df)
      if (prev != null) prev else df
    }
  }

  /** Unpersist and forget every relation memoized for `spark`. */
  def clear(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    memo.keySet.asScala.filter(_._1 eq spark).toSeq.foreach { k =>
      Option(memo.remove(k)).foreach(_.unpersist())
    }
  }
}
