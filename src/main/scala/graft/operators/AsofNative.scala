package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, TimestampNTZType}

import graft.plans.{AsofAuto, AsofJoinPlan, AsofStrategyHint}

/** df-level face of the custom as-of join ([[graft.plans.AsofJoinExec]]
  * / [[graft.plans.BroadcastAsofJoinExec]]): each left row + the latest
  * right row (same key, right time <= left time, ties broken by
  * `rightTiebreak`, last wins), LEFT OUTER. The planner broadcasts a
  * small right side (left then keeps its partitioning and ordering —
  * no exchange at all); otherwise one exchange per side and a single
  * merge pass — never a join-then-argmax inflation. */
object AsofNative {

  /** `leftKey`/`rightKey`/`leftTime`/`rightTime` name integral (or
    * castable-to-long) columns; key and time are compared as longs.
    * Timestamps cast to epoch seconds — for sub-second as-of
    * resolution pre-project micros yourself (`unix_micros`). `hint`
    * pins the physical strategy
    * ([[graft.plans.AsofMerge]]/[[graft.plans.AsofBroadcast]]); the
    * default auto-selects by right-side size like Spark's equi-join
    * planner.
    *
    * Skew: the merge variant clusters on the key, so a pathologically
    * hot key concentrates in one task (AQE skew splitting does not
    * apply to custom nodes). Prefer [[graft.plans.AsofBroadcast]] when
    * the right side fits the broadcast threshold — it is skew-immune
    * (no shuffle at all); otherwise pre-split hot keys upstream the
    * same way as `operators.Skew.saltedJoin`. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      hint: AsofStrategyHint = AsofAuto): DataFrame = {
    // NTZ timestamps and dates have no direct long cast; route them
    // through TIMESTAMP (session-TZ; graft sessions pin UTC) first.
    def asLong(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        case TimestampNTZType | DateType =>
          col(name).cast("timestamp").cast("long")
        case _ => col(name).cast("long")
      }
    val l = left
      .withColumn("__asof_k", asLong(left, leftKey))
      .withColumn("__asof_t", asLong(left, leftTime))
    val r = right
      .withColumn("__asof_k", asLong(right, rightKey))
      .withColumn("__asof_t", asLong(right, rightTime))
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val node = AsofJoinPlan(lp, rp,
      attr(lp, "__asof_k"), attr(rp, "__asof_k"),
      attr(lp, "__asof_t"), attr(rp, "__asof_t"),
      rightTiebreak.map(attr(rp, _)), hint)
    // drop() removes BOTH sides' helper columns (drop-by-name is global)
    GraftPlanBridge.ofRows(left.sparkSession, node)
      .drop("__asof_k", "__asof_t")
  }
}
