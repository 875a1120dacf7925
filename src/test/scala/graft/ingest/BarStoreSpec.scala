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

  // --- lifecycle: compaction + retention -------------------------

  /** A store whose every date partition is fragmented into several
    * files — the layout N streaming appends / task-parallel bootstrap
    * writes leave behind. */
  private def fragmentedStore(): (String, Set[org.apache.spark.sql.Row]) = {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("barstore").toString + "/bars"
    canonical()
      .withColumn("bar_date", to_date(col("timestamp")))
      .repartition(6) // 6 tasks × M dates → up to 6 files per partition
      .write.partitionBy("bar_date").parquet(dir)
    (dir, BarStore.read(spark, dir).collect().toSet)
  }

  private def visibleFiles(dir: String, part: String): Array[String] = {
    val d = new java.io.File(dir, part)
    Option(d.list()).getOrElse(Array.empty)
      .filter(f => !f.startsWith("_") && !f.startsWith("."))
  }

  test("compactDates bin-packs settled partitions without changing content") {
    val (dir, before) = fragmentedStore()
    val parts = new java.io.File(dir).list()
      .filter(_.startsWith("bar_date=")).sorted
    assert(parts.exists(p => visibleFiles(dir, p).length > 1),
      "fixture must start fragmented")
    val done = BarStore.compactDates(spark, dir,
      java.sql.Date.valueOf("2030-01-01"))
    assert(done.nonEmpty)
    // every settled partition now holds exactly its target file count (1
    // at this size), and the rows are untouched
    parts.foreach { p =>
      assert(visibleFiles(dir, p).length === 1, s"partition $p")
    }
    assert(BarStore.read(spark, dir).collect().toSet === before)
    // idempotent: nothing left to compact
    assert(BarStore.compactDates(spark, dir,
      java.sql.Date.valueOf("2030-01-01")).isEmpty)
    // hidden siblings (tmp/trash) are all cleaned up
    assert(new java.io.File(dir).list().forall(n => !n.startsWith("_compact")))
  }

  test("a crash parked mid-swap heals on the next lifecycle run") {
    val (dir, before) = fragmentedStore()
    val parts = new java.io.File(dir).list()
      .filter(_.startsWith("bar_date=")).sorted
    val victim = parts.head
    // simulate dying between the two swap renames: partition parked in
    // a hidden trash dir, live dir absent
    val root = new java.io.File(dir)
    val vName = victim.stripPrefix("bar_date=")
    assert(new java.io.File(root, victim)
      .renameTo(new java.io.File(root, s"_compact_trash_${vName}_deadbeef")))
    // degraded-but-consistent: readers see the store minus the parked
    // partition (hidden prefix ⇒ no doubling, no mixed listing)
    val vDate = java.sql.Date.valueOf(victim.stripPrefix("bar_date="))
    val degraded = BarStore.read(spark, dir).collect().toSet
    assert(degraded === before.filterNot(_.getAs[java.sql.Date]("bar_date") == vDate))
    // any lifecycle entry point heals the window first
    BarStore.compactDates(spark, dir, java.sql.Date.valueOf("2030-01-01"))
    assert(BarStore.read(spark, dir).collect().toSet === before)
    assert(new java.io.File(dir).list().forall(n => !n.startsWith("_compact")))
  }

  test("a crash after publish (superseded trash) is swept, not restored") {
    val (dir, before) = fragmentedStore()
    val parts = new java.io.File(dir).list()
      .filter(_.startsWith("bar_date=")).sorted
    // simulate dying between the publish rename and the trash delete:
    // live partition EXISTS, a stale copy is parked in trash
    val victim = parts.head
    val vName = victim.stripPrefix("bar_date=")
    val root = new java.io.File(dir)
    val trash = new java.io.File(root, s"_compact_trash_${vName}_cafebabe")
    assert(trash.mkdir())
    java.nio.file.Files.writeString(
      new java.io.File(trash, "stale.bin").toPath, "superseded copy")
    // reader is unaffected (trash is hidden), and the next lifecycle
    // run deletes the superseded copy instead of restoring it
    assert(BarStore.read(spark, dir).collect().toSet === before)
    BarStore.compactDates(spark, dir, java.sql.Date.valueOf("2030-01-01"))
    assert(!trash.exists(), "superseded trash swept")
    assert(BarStore.read(spark, dir).collect().toSet === before)
  }

  test("a reader inside the swap window sees old, new, or absent — " +
      "never mixed or doubled") {
    // The compaction swap is two renames; the documented contract is:
    // a concurrent listing observes the full OLD file set, the full
    // NEW set, or (between the renames) the partition ABSENT — never
    // a mix of copies and never doubled rows.  The onAfterPark seam
    // puts this spec exactly inside the transient-missing window.
    val (dir, before) = fragmentedStore()
    val byDate = before.groupBy(_.getAs[java.sql.Date]("bar_date"))
    var windows = 0
    BarStore.compactDates(spark, dir, java.sql.Date.valueOf("2030-01-01"),
      128L * 1024 * 1024, () => {
        windows += 1
        val seen = BarStore.read(spark, dir).collect().toSet
        val seenByDate = seen.groupBy(_.getAs[java.sql.Date]("bar_date"))
        // per partition: either the complete content or nothing at all
        byDate.foreach { case (d, rows) =>
          val got = seenByDate.getOrElse(d, Set.empty)
          assert(got == rows || got.isEmpty,
            s"partition $d mixed/doubled: ${got.size} of ${rows.size} rows")
        }
        // the window is real: exactly one partition is absent right now
        assert(byDate.keys.count(d => !seenByDate.contains(d)) == 1)
        // and nothing beyond the declared partitions ever appears
        assert(seenByDate.keySet.subsetOf(byDate.keySet))
      })
    assert(windows > 0, "the seam must have run inside the swap")
    // after the swap completes, the reader sees the full content again
    assert(BarStore.read(spark, dir).collect().toSet === before)
  }

  test("vacuum drops exactly the expired partitions, idempotently") {
    val (dir, before) = fragmentedStore()
    val dates = before.map(_.getAs[java.sql.Date]("bar_date")).toSeq.sorted
    val cutoff = dates(dates.length / 2) // keep the newer half
    val dropped = BarStore.vacuum(spark, dir, cutoff)
    assert(dropped.nonEmpty &&
      dropped.forall(p => java.sql.Date.valueOf(
        p.stripPrefix("bar_date=")).before(cutoff)))
    val after = BarStore.read(spark, dir).collect().toSet
    assert(after === before.filter(
      r => !r.getAs[java.sql.Date]("bar_date").before(cutoff)))
    assert(BarStore.vacuum(spark, dir, cutoff).isEmpty, "re-run is a no-op")
  }
}
