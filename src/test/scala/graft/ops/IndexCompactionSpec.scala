package graft.ops

import graft.SparkSuite

/** `IndexCompaction.compactIndex` over caller-managed IVF stores:
  * serve-result equivalence across compaction, file-count reduction,
  * and the crash-window heals — the BarStoreSpec lifecycle contract
  * ported to `cid=` partitions. */
class IndexCompactionSpec extends SparkSuite {
  import spark.implicits._

  private def embs = graft.Tables.embeddings(spark, sf())
    .select($"vec_id", $"embedding")

  /** Bootstrap + 3 incremental appends → ≥4 files in touched lists. */
  private def fragmentedStore(quantized: Boolean): String = {
    val path = java.nio.file.Files.createTempDirectory("ivfc").toString
    val parts = (0 until 4).map(i => embs.filter($"vec_id" % 4 === i))
    parts.foreach { p =>
      if (quantized) Similarity.ivfQuantizedAppend(spark, sf(), path, p)
      else Similarity.ivfAppend(spark, sf(), path, p)
    }
    path
  }

  private def cidFiles(path: String): Map[String, Int] = {
    val root = new java.io.File(path)
    root.listFiles().filter(d => d.isDirectory && d.getName.startsWith("cid="))
      .map(d => d.getName ->
        d.listFiles().count(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))).toMap
  }

  test("float store: compaction preserves served results and shrinks files") {
    val path = fragmentedStore(quantized = false)
    val before = Similarity.ivfServeFrom(spark, sf(), path)
      .collect().map(_.toSeq).toSeq
    assert(cidFiles(path).values.max >= 4, "fixture must be fragmented")
    val done = IndexCompaction.compactIndex(spark, path)
    assert(done.nonEmpty, "oversized partitions must be compacted")
    assert(cidFiles(path).values.max === 1,
      "tiny lists bin-pack to one file each")
    val after = Similarity.ivfServeFrom(spark, sf(), path)
      .collect().map(_.toSeq).toSeq
    assert(after === before)
    // no hidden siblings left behind
    val leftovers = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_ivfc_"))
    assert(leftovers.isEmpty)
    // idempotent: nothing left to compact
    assert(IndexCompaction.compactIndex(spark, path).isEmpty)
  }

  test("quantized store: appended-then-compacted serve ≡ fresh one-shot build") {
    val path = fragmentedStore(quantized = true)
    IndexCompaction.compactIndex(spark, path)
    val compacted = Similarity.ivfQuantizedServeFrom(spark, sf(), path)
      .collect().map(_.toSeq).toSeq
    val fresh = java.nio.file.Files.createTempDirectory("ivfcf").toString
    Similarity.ivfQuantizedAppend(spark, sf(), fresh, embs)
    val oneShot = Similarity.ivfQuantizedServeFrom(spark, sf(), fresh)
      .collect().map(_.toSeq).toSeq
    assert(compacted.nonEmpty && compacted === oneShot)
  }

  test("compaction is the replay reconciliation point: duplicate rows collapse") {
    val path = java.nio.file.Files.createTempDirectory("ivfr").toString
    Similarity.ivfAppend(spark, sf(), path, embs)
    Similarity.ivfAppend(spark, sf(), path, embs) // full replay
    val rows0 = spark.read.parquet(path).count()
    IndexCompaction.compactIndex(spark, path)
    val rows1 = spark.read.parquet(path).count()
    assert(rows1 * 2 === rows0, "exact-duplicate replayed rows collapse")
    val served = Similarity.ivfServeFrom(spark, sf(), path)
      .collect().map(_.toSeq).toSeq
    val fresh = java.nio.file.Files.createTempDirectory("ivfrf").toString
    Similarity.ivfAppend(spark, sf(), fresh, embs)
    assert(served === Similarity.ivfServeFrom(spark, sf(), fresh)
      .collect().map(_.toSeq).toSeq)
  }

  test("crash between park and publish heals whole (late appends kept)") {
    val path = fragmentedStore(quantized = false)
    val before = Similarity.ivfServeFrom(spark, sf(), path)
      .collect().map(_.toSeq).toSeq
    // simulate: one partition parked in trash, live dir gone
    val root = new java.io.File(path)
    val part = root.listFiles().filter(_.getName.startsWith("cid=")).head
    val cid = part.getName.stripPrefix("cid=")
    assert(part.renameTo(
      new java.io.File(root, s"_ivfc_trash_${cid}_deadbeef")))
    IndexCompaction.healCrashedSwaps(spark, path)
    assert(new java.io.File(root, s"cid=$cid").isDirectory)
    assert(!root.listFiles().exists(_.getName.startsWith("_ivfc_")))
    val healed = Similarity.ivfServeFrom(spark, sf(), path)
      .collect().map(_.toSeq).toSeq
    assert(healed === before)
  }

  test("crash after publish rescues non-manifest files, drops the stale copy") {
    val path = fragmentedStore(quantized = false)
    val root = new java.io.File(path)
    val part = root.listFiles().filter(_.getName.startsWith("cid=")).head
    val cid = part.getName.stripPrefix("cid=")
    // simulate: live partition EXISTS (published), trash holds one
    // superseded (manifest-claimed) file and one late-appended file
    val trash = new java.io.File(root, s"_ivfc_trash_${cid}_cafebabe")
    assert(trash.mkdir())
    val stale = part.listFiles().filter(_.getName.endsWith(".parquet")).head
    // copy a real list file out as the "superseded" content
    java.nio.file.Files.copy(stale.toPath,
      new java.io.File(trash, "old-claimed.parquet").toPath)
    java.nio.file.Files.copy(stale.toPath,
      new java.io.File(trash, "late-append.parquet").toPath)
    java.nio.file.Files.write(
      new java.io.File(root, s"_ivfc_snap_${cid}_cafebabe").toPath,
      "old-claimed.parquet".getBytes("UTF-8"))
    IndexCompaction.healCrashedSwaps(spark, path)
    val live = new java.io.File(root, s"cid=$cid")
    assert(new java.io.File(live, "late-append.parquet").isFile,
      "the late append must be rescued into the live partition")
    assert(!new java.io.File(live, "old-claimed.parquet").exists(),
      "the superseded copy must not be restored")
    assert(!root.listFiles().exists(_.getName.startsWith("_ivfc_")))
  }

  test("appender-recreated live dir + unpublished tmp: parked files merge back whole") {
    val path = fragmentedStore(quantized = false)
    val root = new java.io.File(path)
    val part = root.listFiles().filter(_.getName.startsWith("cid=")).head
    val cid = part.getName.stripPrefix("cid=")
    val parked = part.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.getName)
    // simulate: compactor parked the partition and DIED before
    // publish (tmp still at the root), then a concurrent appender
    // recreated the live dir with one new file
    assert(part.renameTo(
      new java.io.File(root, s"_ivfc_trash_${cid}_feedface")))
    val trash = new java.io.File(root, s"_ivfc_trash_${cid}_feedface")
    val live = new java.io.File(root, s"cid=$cid")
    assert(live.mkdir())
    java.nio.file.Files.copy(
      trash.listFiles().filter(_.getName.endsWith(".parquet")).head.toPath,
      new java.io.File(live, "appended-after-park.parquet").toPath)
    val tmp = new java.io.File(root, s"_ivfc_tmp_${cid}_feedface")
    assert(tmp.mkdir())
    java.nio.file.Files.write(
      new java.io.File(tmp, "unpublished.parquet").toPath,
      Array.empty[Byte])
    java.nio.file.Files.write(
      new java.io.File(root, s"_ivfc_snap_${cid}_feedface").toPath,
      parked.sorted.mkString("\n").getBytes("UTF-8"))
    IndexCompaction.healCrashedSwaps(spark, path)
    // EVERY parked file survives — live-dir existence alone must not
    // be read as "publish happened" when the tmp is still unpublished
    parked.foreach(n => assert(new java.io.File(live, n).isFile,
      s"parked file $n must be merged back"))
    assert(new java.io.File(live, "appended-after-park.parquet").isFile)
    assert(!root.listFiles().exists(_.getName.startsWith("_ivfc_")))
  }

  test("publish raced a recreated live dir: nested shell pulled up before trash drop") {
    val path = fragmentedStore(quantized = false)
    val root = new java.io.File(path)
    val part = root.listFiles().filter(_.getName.startsWith("cid=")).head
    val cid = part.getName.stripPrefix("cid=")
    val donor = part.listFiles().filter(_.getName.endsWith(".parquet")).head
    // simulate: publish renamed tmp INSIDE a recreated live dir (the
    // posix nested-rename hazard), then the compactor died before the
    // nested fix-up and trash delete
    val shell = new java.io.File(part, s"_ivfc_tmp_${cid}_0ddba11")
    assert(shell.mkdir())
    java.nio.file.Files.copy(donor.toPath,
      new java.io.File(shell, "compacted.parquet").toPath)
    val trash = new java.io.File(root, s"_ivfc_trash_${cid}_0ddba11")
    assert(trash.mkdir())
    java.nio.file.Files.copy(donor.toPath,
      new java.io.File(trash, "old-claimed.parquet").toPath)
    java.nio.file.Files.write(
      new java.io.File(root, s"_ivfc_snap_${cid}_0ddba11").toPath,
      "old-claimed.parquet".getBytes("UTF-8"))
    IndexCompaction.healCrashedSwaps(spark, path)
    assert(new java.io.File(part, "compacted.parquet").isFile,
      "the published copy must be pulled out of the nested shell")
    assert(!new java.io.File(part, "old-claimed.parquet").exists())
    assert(!new java.io.File(part, s"_ivfc_tmp_${cid}_0ddba11").exists())
    assert(!root.listFiles().exists(_.getName.startsWith("_ivfc_")))
  }

  test("a reader inside the swap window sees old, new, or absent — " +
      "never mixed or doubled") {
    // Same contract as BarStoreSpec's interleave test, over cid=
    // lists: between park and publish a pruned probe may find the
    // list ABSENT (fewer candidates for that probe — degraded, safe),
    // but never a mixed listing and never doubled rows.
    val path = fragmentedStore(quantized = false)
    val before = spark.read.parquet(path)
      .select($"vec_id", $"cid").collect()
      .groupBy(_.getAs[Int]("cid")).map { case (c, rs) =>
        c -> rs.map(_.getAs[Long]("vec_id")).toSeq.sorted }
    var windows = 0
    IndexCompaction.compactIndex(spark, path, 128L * 1024 * 1024,
      () => (), () => {
        windows += 1
        val seen = spark.read.parquet(path)
          .select($"vec_id", $"cid").collect()
          .groupBy(_.getAs[Int]("cid")).map { case (c, rs) =>
            c -> rs.map(_.getAs[Long]("vec_id")).toSeq.sorted }
        before.foreach { case (c, ids) =>
          val got = seen.getOrElse(c, Seq.empty)
          assert(got == ids || got.isEmpty,
            s"cid=$c mixed/doubled: ${got.size} of ${ids.size} rows")
        }
        assert(before.keys.count(c => !seen.contains(c)) == 1,
          "exactly the parked list is absent inside the window")
      }, "cid")
    assert(windows > 0, "the seam must have run inside the swap")
    val after = spark.read.parquet(path)
      .select($"vec_id", $"cid").collect()
      .groupBy(_.getAs[Int]("cid")).map { case (c, rs) =>
        c -> rs.map(_.getAs[Long]("vec_id")).toSeq.sorted }
    assert(after == before, "content is untouched once the swap completes")
  }
}
