package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query and
  * total wall seconds.  Uses the engine's tuned session (AQE, shuffle
  * partitions = cores, broadcast threshold) at local[32] to match the
  * driver harness.  Each query is forced with count() — result sizes
  * are small (aggregates/top-k), so timing is dominated by the real
  * scan/join/shuffle work, not result materialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional regex arg filters the query set (local iteration aid).
    val wanted = args.headOption.map(_.r)
    val queries = SparkEntry.queries.filter { case (name, _) =>
      wanted.forall(_.findFirstIn(name).isDefined)
    }
    val spark = GraftSession.build("graft-bench")
    // Warm-up: run every query once at the smallest sf so JIT +
    // whole-stage-codegen compilation (1-3 s per distinct plan, data-
    // size independent) isn't billed to the measured runs.
    queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
