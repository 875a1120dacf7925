package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's private[sql] surface: build a DataFrame
  * from a custom LogicalPlan (`Dataset.ofRows` is private[sql]).  This
  * is the standard extension-library technique for exposing custom
  * logical operators through the public Dataset API. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
