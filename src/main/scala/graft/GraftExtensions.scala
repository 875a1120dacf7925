package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Spark-native library packaging: everything graft adds to a session
  * — native expressions and the as-of join planner strategy — injected
  * through the standard extension point, so a user enables the whole
  * library with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), no imperative
  * registration calls needed.  `GraftFunctions.register` remains as
  * the programmatic path used by the operators themselves (idempotent
  * either way — injection and registration agree on names/builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[DotProduct]),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_tokens"),
      info("graft_tokens", classOf[GraftTokens]),
      (es: Seq[Expression]) => GraftTokens(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_h60"),
      info("graft_h60", classOf[GraftH60]),
      (es: Seq[Expression]) => GraftH60(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[GraftSimHash]),
      (es: Seq[Expression]) => GraftSimHash(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingles3"),
      info("graft_shingles3", classOf[GraftShingles3]),
      (es: Seq[Expression]) => GraftShingles3(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[GraftMinHash]),
      (es: Seq[Expression]) => GraftMinHash(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]),
      (es: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions
        .aggregate.BloomFilterAggregate(es.head, es(1), es(2), 0, 0)))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]),
      (es: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es.head, es(1))))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
