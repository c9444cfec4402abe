package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for `private[sql]` constructors: builds a DataFrame
  * from a hand-constructed LogicalPlan (`Dataset.ofRows` is package
  * private). Lives in the org.apache.spark.sql package solely for
  * visibility; contains no logic. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
