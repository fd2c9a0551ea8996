package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to the one `private[sql]` constructor a whole-operator
  * extension needs: building a `DataFrame` from a custom `LogicalPlan`
  * (`classic.Dataset.ofRows`). Spark offers planner-strategy injection
  * as public API (`SparkSessionExtensions.injectPlannerStrategy`) but no
  * public plan→DataFrame constructor, so every library that ships a
  * custom logical operator hosts this one-liner inside the `sql`
  * package. Nothing else in this repo lives outside the `graft`
  * namespace.
  */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
