package graft

/** Dev/ops tool: print the banded near-dup cap receipts (MinHash and
  * SimHash) for a corpus at an arbitrary band-bucket cap — the
  * observability a production deployment reads to tune
  * `TextOps.MaxBandBucket` (how many candidate pairs would bounded
  * work give up at this cap, and how many verified pairs survive).
  * Usage: runMain graft.CapReport <sfDir> [cap] */
object CapReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cap = if (args.length > 1) args(1).toInt
              else graft.ops.TextOps.MaxBandBucket
    val spark = GraftSession.build("graft-cap-report")
    val t0 = System.nanoTime()
    val mh = graft.ops.Dedup.minhashCapReport(spark, sfDir, cap).collect()(0)
    println(s"[cap-report] minhash cap=$cap " +
      s"capped_buckets=${mh.getLong(0)} capped_pairs=${mh.getLong(1)} " +
      s"kept_pairs=${mh.getLong(2)} " +
      f"(${(System.nanoTime() - t0) / 1e9}%.2fs)")
    val t1 = System.nanoTime()
    val sh = graft.ops.Dedup.simhashCapReport(spark, sfDir, cap).collect()(0)
    println(s"[cap-report] simhash cap=$cap " +
      s"capped_buckets=${sh.getLong(0)} capped_pairs=${sh.getLong(1)} " +
      s"kept_pairs=${sh.getLong(2)} " +
      f"(${(System.nanoTime() - t1) / 1e9}%.2fs)")
    spark.stop()
  }
}
