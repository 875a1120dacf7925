package graft.ingest

import java.nio.file.Files
import graft.SparkSuite
import graft.Tables

/** T3 invariant: the keyed upsert is idempotent — running the ingest
  * twice leaves the store byte-equal in content to running it once, and
  * a re-ingest of a trailing window only rewrites touched partitions. */
class BarStoreSpec extends SparkSuite {
  import spark.implicits._

  private def canonical() = Canonicalize.canonicalize(
    BarPipeline.barsFromTicks(Tables.events(spark, sf()), "Day"), "Day").get

  test("upsert twice ≡ upsert once (idempotent keyed sink, S4/T3)") {
    val dir = Files.createTempDirectory("barstore").toString + "/bars"
    val bars = canonical()
    BarStore.upsert(bars, dir)
    val once = BarStore.read(spark, dir).collect().toSet
    BarStore.upsert(bars, dir)
    val twice = BarStore.read(spark, dir).collect().toSet
    assert(once === twice)
    assert(once.nonEmpty)
  }

  test("re-ingest of a trailing window overwrites only touched dates") {
    val dir = Files.createTempDirectory("barstore").toString + "/bars"
    val bars = canonical()
    BarStore.upsert(bars, dir)
    val before = BarStore.read(spark, dir).count()
    // trailing-window refetch: last 10 days only (overlapping, T3/T4)
    val trailing = bars.filter($"timestamp" >= "2024-01-21")
    BarStore.upsert(trailing, dir)
    val after = BarStore.read(spark, dir)
    // untouched early partitions survive; touched ones are replaced 1:1
    assert(after.count() === before)
    assert(after.filter($"timestamp" < "2024-01-21").count() > 0)
  }

  test("duplicate keys in one batch collapse (dropDuplicates on key)") {
    val dir = Files.createTempDirectory("barstore").toString + "/bars"
    val bars = canonical()
    BarStore.upsert(bars.union(bars), dir)
    assert(BarStore.read(spark, dir).count() === bars.count())
  }
}
