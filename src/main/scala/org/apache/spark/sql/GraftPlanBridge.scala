package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Spark keeps `Dataset.ofRows` private[sql]; this one-liner lives in
  * the `org.apache.spark.sql` package purely to hand graft's custom
  * logical plans (e.g. [[graft.plans.AsofJoinPlan]]) back to the
  * session as a DataFrame — the standard extension-library pattern. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Forwarder for the private[sql] float-key canonicalizer (-0.0 →
    * 0.0, canonical NaN) — custom grouping plans must apply it
    * themselves because the optimizer rule only matches built-in
    * Aggregate/Window/Join nodes. No-op on non-float expressions. */
  def normalizeFloats(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
