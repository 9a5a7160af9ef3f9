package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, explode, lit, sequence}
import org.apache.spark.sql.types.{DateType, TimestampNTZType}

import graft.plans.{AsofAuto, AsofJoinPlan, AsofMerge, AsofStrategyHint}

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
    * (no shuffle at all); when it doesn't, [[asofJoinSkewSafe]] salts
    * the hot keys across buckets with identical results. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      hint: AsofStrategyHint = AsofAuto): DataFrame =
    asofJoinMulti(left, right, Seq(leftKey), Seq(rightKey),
      leftTime, rightTime, rightTiebreak, hint)

  /** Composite-key as-of join: keys compared lexicographically, a row
    * with ANY null key component never matches. The single-key form
    * above is the common face; multi-key exists for salted/pre-split
    * layouts ([[asofJoinSkewSafe]]) and natural compound keys
    * ((tenant, user), (exchange, symbol), ...). */
  def asofJoinMulti(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      hint: AsofStrategyHint = AsofAuto): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key arity mismatch: $leftKeys vs $rightKeys")
    // NTZ timestamps and dates have no direct long cast; route them
    // through TIMESTAMP (session-TZ; graft sessions pin UTC) first.
    // String keys are accepted ONLY as numeric strings (a topic `key`
    // is StringType and often numeric — enrichAsof's case): under the
    // session's pinned ANSI mode a non-numeric string key fails the
    // cast LOUDLY at runtime; a session with ANSI off would instead
    // cast to null and silently enrich nothing (r9 review note) — use
    // a numeric surrogate key there.
    def asLong(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        case TimestampNTZType | DateType =>
          col(name).cast("timestamp").cast("long")
        case _ => col(name).cast("long")
      }
    val kCols = leftKeys.indices.map(i => s"__asof_k$i")
    val l = leftKeys.zip(kCols).foldLeft(left) { case (df, (k, c)) =>
      df.withColumn(c, asLong(left, k))
    }.withColumn("__asof_t", asLong(left, leftTime))
    val r = rightKeys.zip(kCols).foldLeft(right) { case (df, (k, c)) =>
      df.withColumn(c, asLong(right, k))
    }.withColumn("__asof_t", asLong(right, rightTime))
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val node = AsofJoinPlan(lp, rp,
      kCols.map(attr(lp, _)), kCols.map(attr(rp, _)),
      attr(lp, "__asof_t"), attr(rp, "__asof_t"),
      rightTiebreak.map(attr(rp, _)), hint)
    // drop() removes BOTH sides' helper columns (drop-by-name is global)
    GraftPlanBridge.ofRows(left.sparkSession, node)
      .drop(kCols :+ "__asof_t": _*)
  }

  /** Skew-safe merge as-of join: the left (fact) side is salted
    * `buckets` ways on `discriminator` (a left column with per-row
    * variety — an event id / offset), the right side is replicated once
    * per salt value, and the join key becomes (key, salt). A hot key's
    * left rows then spread over `buckets` reducers instead of
    * concentrating in one straggler task, while every salt bucket still
    * sees the key's FULL right history — so results are identical to
    * the unsalted merge join (spec-proved on a 90%-hot-key corpus).
    *
    * Cost: `buckets` × the right-side shuffle (the right side is the
    * smaller one by assumption — if it fits the broadcast threshold use
    * the broadcast variant instead, which is skew-immune for free).
    */
  def asofJoinSkewSafe(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      discriminator: String, buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val l = left.withColumn("__asof_salt",
      Skew.salt(col(discriminator), buckets).cast("long"))
    val r = right.withColumn("__asof_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    asofJoinMulti(l, r,
      Seq(leftKey, "__asof_salt"), Seq(rightKey, "__asof_salt"),
      leftTime, rightTime, rightTiebreak, AsofMerge)
      .drop("__asof_salt")
  }
}
