package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: a session built with ONLY
  * `withExtensions(new GraftExtensions)` (no imperative register
  * calls) must resolve every graft function and plan the native as-of
  * join.  Builds its own session on the shared SparkContext and
  * restores the default afterwards so other suites are unaffected. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a withExtensions session gets functions and the asof strategy") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      // functions resolve without GraftFunctions.register
      val r = s.sql(
        """SELECT graft_h60('abc') AS h,
          |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  graft_simhash(array('a', 'b')) AS sh,
          |  size(graft_shingles3(array('a', 'b', 'c', 'd'))) AS ns,
          |  size(graft_minhash(array('a b c'))) AS nm
          |""".stripMargin).head()
      assert(r.getAs[Double]("d") == 11.0)
      assert(r.getAs[Int]("ns") == 2)
      assert(r.getAs[Int]("nm") == graft.ops.TextOps.NumPerms)
      // the planner strategy arrives via injection, not the imperative
      // experimental-methods path (nothing has installed that yet on
      // this fresh session)
      assert(s.sessionState.planner.strategies
        .exists(_.isInstanceOf[graft.plans.AsofJoinStrategy.type]))
      val left = Seq(("A", 5L)).toDF("sym", "ts")
      val right = Seq(("A", 3L, 1.0)).toDF("sym", "rts", "v")
      val plan = graft.ops.Temporal
        .asofJoinNative(left, right, "sym", "ts", "rts")
        .queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"), plan.take(800))
    } finally {
      s.sql("SELECT 1").collect() // session healthy before teardown
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
