package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the one operator in the suite whose
  * BEST plan Spark's built-ins cannot express (SURVEY §6.5's named
  * candidate). Semantics: each left row is joined to the LATEST right
  * row with the same key whose time is <= the left row's time (ties
  * broken by `rightTiebreak`, last wins), or nulls when none — i.e.
  * the reference's "enrich each event with the most recent state at
  * event time", LEFT OUTER.
  *
  * Why a custom plan: declaratively this is a (range-predicated) join
  * followed by a per-left-row argmax — at least one extra aggregation
  * shuffle after the join shuffle, with the join output inflated by
  * every EARLIER right match before argmax throws them away. The
  * physical operator instead asks EnsureRequirements for co-partitioned
  * children sorted by (key, time): one exchange per side and a single
  * streaming merge pass per partition, no intermediate inflation. This
  * is the sort-merge-join shape with a "remember the last qualifying
  * right row" cursor instead of a buffered equi-match.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical as-of join to its physical
  * operator (injected by [[graft.GraftExtensions]]). */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Physical merge as-of join. Requires both children clustered on the
  * key (EnsureRequirements co-partitions them, exactly as for a
  * sort-merge join) and sorted by (key, time [, tiebreaks]); emits one
  * output row per left row in left order. Key and time expressions
  * must be LongType (the df-level API casts); null key or time on
  * either side never matches (left rows still emit, right-padded with
  * nulls — left-outer semantics).
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // right side additionally sorts by the tiebreaks so "last qualifying
  // row" IS the argmax of (time, tiebreaks...)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTime, Ascending) +:
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightArity = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // cursor state: the best (= latest-so-far) right row for bestKey
      var best: InternalRow = null
      var bestKey = 0L
      var haveBest = false
      lIter.map { l =>
        val lk = lkB.eval(l)
        val lt = ltB.eval(l)
        if (lk == null || lt == null) proj(joined(l, nullRight))
        else {
          val lkL = lk.asInstanceOf[Long]
          val ltL = lt.asInstanceOf[Long]
          if (haveBest && bestKey != lkL) { haveBest = false; best = null }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rkB.eval(rBuf.head)
            if (rk == null) rBuf.next() // null keys never match
            else {
              val rkL = rk.asInstanceOf[Long]
              if (rkL < lkL) rBuf.next() // stale key: discard
              else if (rkL == lkL) {
                val rt = rtB.eval(rBuf.head)
                if (rt == null) rBuf.next() // null time never matches
                else if (rt.asInstanceOf[Long] <= ltL) {
                  // qualifying and sorted ascending -> later rows are
                  // better; keep overwriting (copy: source rows reused)
                  best = rBuf.next().copy(); bestKey = lkL; haveBest = true
                } else advancing = false // future right row: stop here
              } else advancing = false // right is past this key
            }
          }
          if (haveBest && bestKey == lkL) proj(joined(l, best))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}
