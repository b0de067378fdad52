package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering, RowOrdering, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface needed by graft's custom
  * operator (graft.plans.TopKPerGroup): constructing a DataFrame from a
  * custom logical plan, and building a row ordering from SortOrder. This
  * is the standard extension-library pattern (same technique as Sedona /
  * Delta et al.) — kept to exactly two forwarders.
  */
object GraftBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def createOrdering(order: Seq[SortOrder], schema: Seq[Attribute]): BaseOrdering =
    RowOrdering.create(order, schema)
}
