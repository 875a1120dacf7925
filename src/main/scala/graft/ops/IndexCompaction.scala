package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for caller-managed IVF list stores.
  *
  * `Similarity.ivfAppend` / `ivfQuantizedAppend` (and their streaming
  * wrapper `StreamingIndex`) add ONE new parquet file per appended
  * batch per touched `cid=` partition — the append-only contract that
  * makes each append atomic per file.  A long-lived
  * streaming-maintained index therefore accumulates tiny list files
  * exactly the way the bar store did before its compactor: after a
  * day of micro-batches a probe pays hundreds of per-file open/footer
  * costs per partition.  This is the `BarStore.compactDates`
  * discipline ported to `cid=` partitions, layout-generic over BOTH
  * store payloads (float `embedding` lists and int8 `code/scale/nrm`
  * lists) because it never interprets the rows.
  *
  * Consistency discipline, extended for a CONCURRENT APPENDER (the
  * one writer the bar store's single-writer contract excludes, but a
  * streaming-maintained index explicitly has):
  *
  *  1. snapshot the partition's current file listing S;
  *  2. persist S as a hidden `_ivfc_snap_<cid>_<uuid>` manifest at
  *     the store root (crash insurance for step 6);
  *  3. rewrite EXACTLY the files in S into ceil(bytes/target)
  *     bin-packed files inside a hidden `_ivfc_tmp_*` sibling —
  *     exact-duplicate rows (at-least-once replays of the same
  *     append) collapse here, making compaction the reconciliation
  *     point the serve-side id-dedup otherwise covers;
  *  4. park: rename(`cid=k`, `_ivfc_trash_<k>_<uuid>`) — atomic;
  *  5. publish: rename(tmp, `cid=k`) — atomic;
  *  6. rescue: any file found in the parked dir that is NOT in S was
  *     appended between snapshot and park — move it into the live
  *     dir (file names are job-UUID-unique);
  *  7. drop the trash, then the manifest.
  *
  * Every entry point first heals crash windows: a trash dir with no
  * live partition is renamed back whole (crash between 4 and 5 — late
  * appends were inside it, nothing lost); a trash dir WITH a live
  * partition whose build tmp STILL EXISTS means the live dir was
  * recreated by a concurrent appender before the crashed publish —
  * the parked files are the only copy and are merged back whole; a
  * trash dir with a live partition and no tmp has its non-manifest
  * files rescued per step 6 and is then dropped (crash between 5 and
  * 7 — after first pulling up a nested publish shell if the rename
  * raced a recreated dir).  If the manifest is missing
  * the heal conservatively moves ALL parked files back into the live
  * dir: that can only duplicate rows, never lose them, and both serve
  * paths dedup candidates by id before ranking — so the worst crash
  * outcome is a partition that compacts again next run.
  *
  * Hidden-sibling names carry the BARE cid (no `=`): Spark un-hides
  * `_`-prefixed dirs whose name contains `=` (partition-value
  * support), which would surface tmp/trash to readers. */
object IndexCompaction {

  // `partCol` generalizes the discipline to any integer-valued
  // partition column — `cid=` IVF lists and `tshard=` lexical
  // postings share the lifecycle (the compactor never interprets
  // rows, only partition directories)
  private def partRx(partCol: String) = s"^$partCol=(-?\\d+)$$".r
  private val TrashRx = "^_ivfc_trash_(-?\\d+)_([0-9a-f-]+)$".r

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def listFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
    Option(fs.listStatus(dir)).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))

  private def targetFiles(bytes: Long, targetBytes: Long): Int =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

  /** Compact every `cid=` partition of the store at `indexPath` whose
    * file count exceeds ceil(bytes / targetBytes).  Returns
    * (partition, filesBefore, filesAfter) per rewrite.  Safe against
    * a concurrent appender (files appearing mid-compaction are
    * rescued, see header) and against crashes at any step (healed on
    * the next lifecycle call); assumes a single COMPACTOR per store,
    * like all graft store writers. */
  def compactIndex(spark: SparkSession, indexPath: String,
                   targetBytes: Long = 128L * 1024 * 1024,
                   partCol: String = "cid")
      : Seq[(String, Int, Int)] =
    compactIndex(spark, indexPath, targetBytes, () => (), partCol)

  private[graft] def compactIndex(spark: SparkSession, indexPath: String,
      targetBytes: Long, onBeforeSwap: () => Unit,
      partCol: String): Seq[(String, Int, Int)] =
    compactIndex(spark, indexPath, targetBytes, onBeforeSwap, () => (),
      partCol)

  /** Test seams: `onBeforeSwap` runs after the tmp build, before the
    * park rename — the widest window a concurrent append can race;
    * `onAfterPark` runs INSIDE the transient-missing window (between
    * park and publish) so the interleave spec can pin what a
    * concurrent reader observes there. */
  private[graft] def compactIndex(spark: SparkSession, indexPath: String,
      targetBytes: Long, onBeforeSwap: () => Unit,
      onAfterPark: () => Unit, partCol: String)
      : Seq[(String, Int, Int)] = {
    import org.apache.hadoop.fs.Path
    require(targetBytes > 0, "targetBytes must be positive")
    val (fs, root) = fsOf(spark, indexPath)
    if (!fs.exists(root)) return Seq.empty
    healCrashedSwaps(spark, indexPath, partCol)
    sweepStale(fs, root)
    val rx = partRx(partCol)
    Option(fs.listStatus(root)).getOrElse(Array.empty).toSeq
      .filter(d => d.isDirectory && rx.findFirstIn(d.getPath.getName).nonEmpty)
      .sortBy(_.getPath.getName)
      .flatMap { d =>
        val dir = d.getPath
        val cid = dir.getName.stripPrefix(s"$partCol=")
        val snap = listFiles(fs, dir)
        val bytes = snap.map(_.getLen).sum
        val n = targetFiles(bytes, targetBytes)
        if (snap.length <= n) None
        else {
          val uuid = java.util.UUID.randomUUID().toString
          // 2. manifest first: the heal's old-vs-late discriminator
          val manifest = new Path(root, s"_ivfc_snap_${cid}_$uuid")
          val out = fs.create(manifest, true)
          out.write(snap.map(_.getPath.getName).sorted.mkString("\n")
            .getBytes("UTF-8"))
          out.close()
          // 3. rewrite exactly the snapshot files (NOT the live dir —
          // a file appended after this point must stay out of tmp so
          // the rescue step re-homes it instead of doubling it);
          // exact-duplicate rows from replayed appends collapse here
          spark.read.parquet(snap.map(_.getPath.toString): _*)
            .dropDuplicates()
            .coalesce(n)
            .write.mode(SaveMode.Overwrite)
            .parquet(new Path(root, s"_ivfc_tmp_${cid}_$uuid").toString)
          onBeforeSwap()
          val tmp = new Path(root, s"_ivfc_tmp_${cid}_$uuid")
          val trash = new Path(root, s"_ivfc_trash_${cid}_$uuid")
          // 4. park (atomic)
          if (!fs.rename(dir, trash)) {
            fs.delete(tmp, true); fs.delete(manifest, false)
            throw new java.io.IOException(s"cannot park $dir for swap")
          }
          onAfterPark()
          // 5. publish (atomic); on failure restore rather than lose
          if (!fs.rename(tmp, dir)) {
            fs.rename(trash, dir)
            fs.delete(tmp, true); fs.delete(manifest, false)
            throw new java.io.IOException(s"cannot publish compacted $dir")
          }
          // an appender may have RECREATED the live dir between park
          // and publish; posix rename then moves tmp INSIDE it and
          // still returns true (publishIndex's documented hazard) —
          // pull the compacted files up and drop the nested shell.
          // The shell is `_`-prefixed with no `=`, so readers never
          // saw it even transiently.
          val nested = new Path(dir, tmp.getName)
          if (fs.exists(nested)) {
            listFiles(fs, nested).foreach(f =>
              fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
            fs.delete(nested, true)
          }
          // 6. rescue files appended between snapshot and park
          val snapNames = snap.map(_.getPath.getName).toSet
          listFiles(fs, trash).filterNot(f => snapNames(f.getPath.getName))
            .foreach(f => fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
          // 7. drop trash, then manifest
          fs.delete(trash, true)
          fs.delete(manifest, false)
          Some((dir.getName, snap.length, n))
        }
      }
  }

  /** Heal the crash windows (see header).  Idempotent; called by
    * `compactIndex` on entry and callable directly by a store owner
    * before serving if it wants eager repair. */
  def healCrashedSwaps(spark: SparkSession, indexPath: String,
                       partCol: String = "cid"): Unit = {
    import org.apache.hadoop.fs.Path
    val (fs, root) = fsOf(spark, indexPath)
    if (!fs.exists(root)) return
    Option(fs.globStatus(new Path(root, "_ivfc_trash_*")))
      .getOrElse(Array.empty).foreach { t =>
        TrashRx.findFirstMatchIn(t.getPath.getName).foreach { m =>
          val (cid, uuid) = (m.group(1), m.group(2))
          val live = new Path(root, s"$partCol=$cid")
          val manifest = new Path(root, s"_ivfc_snap_${cid}_$uuid")
          val tmp = new Path(root, s"_ivfc_tmp_${cid}_$uuid")
          if (!fs.exists(live)) {
            // died between park and publish: the parked dir is the
            // whole partition, late appends included — restore whole
            fs.rename(t.getPath, live)
          } else if (fs.exists(tmp)) {
            // live EXISTS but the build tmp was never published: a
            // concurrent appender recreated the partition between
            // park and publish, then the compactor died.  The parked
            // dir is the pre-compaction truth — live-dir existence
            // alone would misread this as the post-publish window and
            // delete the only copy of every manifest-claimed file.
            // Merge ALL parked files into the live dir (append file
            // names are job-UUID-unique, so no clobber; duplicates
            // are serve-safe, loss is not) and drop the unpublished
            // compacted copy — the partition just compacts again.
            listFiles(fs, t.getPath).foreach(f =>
              fs.rename(f.getPath, new Path(live, f.getPath.getName)))
            fs.delete(t.getPath, true)
            fs.delete(tmp, true)
          } else {
            // publish happened (tmp is gone).  If it raced a
            // recreated live dir, posix rename nested the compacted
            // files inside a hidden shell — pull them up before
            // touching the trash, or the claimed originals would be
            // dropped while their replacement stays invisible.
            val nested = new Path(live, tmp.getName)
            if (fs.exists(nested)) {
              listFiles(fs, nested).foreach(f =>
                fs.rename(f.getPath, new Path(live, f.getPath.getName)))
              fs.delete(nested, true)
            }
            // died between publish and trash delete: rescue anything
            // the manifest doesn't claim, then drop the stale copy.
            // No manifest → move EVERYTHING back (duplicates are
            // serve-safe, loss is not).
            val claimed: Set[String] =
              if (fs.exists(manifest)) {
                val in = fs.open(manifest)
                val txt = new String(in.readAllBytes(), "UTF-8")
                in.close()
                txt.split("\n").filter(_.nonEmpty).toSet
              } else Set.empty
            listFiles(fs, t.getPath)
              .filterNot(f => claimed(f.getPath.getName))
              .foreach(f =>
                fs.rename(f.getPath, new Path(live, f.getPath.getName)))
            fs.delete(t.getPath, true)
          }
          if (fs.exists(manifest)) fs.delete(manifest, false)
        }
      }
  }

  /** Sweep `_ivfc_tmp_*` build dirs and orphaned `_ivfc_snap_*`
    * manifests leaked by crashed builds — age-gated one hour so a
    * live concurrent build is never swept (publishIndex's rule). */
  private def sweepStale(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val cutoff = System.currentTimeMillis() - 3600L * 1000L
    Seq("_ivfc_tmp_*", "_ivfc_snap_*").foreach { pat =>
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(root, pat)))
        .getOrElse(Array.empty)
        .filter(_.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, true))
    }
  }
}
