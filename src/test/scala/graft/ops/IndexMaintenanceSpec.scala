package graft.ops

import graft.{SparkSuite, Tables}

/** Pins for `Similarity.indexMaintain`: the no-op branch must match
  * the health report it is derived from, and the rebuild branch must
  * retrain a √n codebook from the DRIFTED store contents and restore
  * balance — on an isolated store (storeBase), never the shared one. */
class IndexMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("maint_store").toString

  test("balanced store: maintenance is a no-op matching the health report") {
    val base = freshBase()
    val r = Similarity.indexMaintain(spark, sf(), Some(base), 3.0)
      .collect()(0)
    assert(!r.getAs[Boolean]("rebuilt"))
    val health = Similarity.indexHealth(spark, sf(), Some(base)).collect()
    assert(r.getAs[Long]("n_vecs") == health.map(_.getAs[Long]("n_vecs")).sum)
    assert(r.getAs[Long]("k") == health.length.toLong)
    assert(r.getAs[Double]("worst_balance") ==
      health.map(_.getAs[Double]("balance")).max)
    assert(r.getAs[Long]("k_after") == r.getAs[Long]("k"))
    assert(r.getAs[Double]("worst_after") == r.getAs[Double]("worst_balance"))
  }

  test("drifted store: rebuild retrains a right-sized codebook and restores balance") {
    val base = freshBase()
    // build the store, then drift it: append the NEGATED corpus (a
    // population the old codebook has no centroids for) crammed into
    // one list - the accumulated-streaming-append failure shape
    Similarity.indexMaintain(spark, sf(), Some(base), 3.0)
    val stores = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("graft_ivf_km_"))
    assert(stores.length == 1)
    val store = stores(0).getAbsolutePath
    val hot = spark.read.parquet(store)
      .groupBy("cid").count().orderBy(org.apache.spark.sql.functions.desc("count"))
      .collect()(0).getAs[Number]("cid").longValue()
    Tables.embeddings(spark, sf())
      .select($"vec_id" + 1000L as "vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => -x).as("embedding"),
        org.apache.spark.sql.functions.lit(hot).as("cid"))
      .write.mode("append").partitionBy("cid").parquet(store)

    val r = Similarity.maintainStore(spark, sf(), store, Some(base), 3.0)
      .collect()(0)
    assert(r.getAs[Boolean]("rebuilt"), r.toString)
    assert(r.getAs[Long]("n_vecs") == 1000L)
    assert(r.getAs[Double]("worst_balance") > 3.0)
    assert(r.getAs[Double]("worst_after") < r.getAs[Double]("worst_balance"),
      r.toString)
    // right-sized: ~sqrt(1000) centroids instead of the original 5
    assert(r.getAs[Long]("k_after") >= 20L && r.getAs[Long]("k_after") <= 40L,
      r.toString)
    // idempotent: re-running maintenance on the same drifted store
    // reaches the same published rebuild (build-if-absent)
    val r2 = Similarity.maintainStore(spark, sf(), store, Some(base), 3.0)
      .collect()(0)
    assert(r2.getAs[Double]("worst_after") == r.getAs[Double]("worst_after"))
  }
}
