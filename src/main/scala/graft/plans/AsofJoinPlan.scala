package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the one operator in the suite whose
  * BEST plan Spark's built-ins cannot express (SURVEY §6.5's named
  * candidate). Semantics: each left row is joined to the LATEST right
  * row with the same key whose time is <= the left row's time (ties
  * broken by `rightTiebreak`, last wins), or nulls when none — i.e.
  * the reference's "enrich each event with the most recent state at
  * event time", LEFT OUTER.
  *
  * Keys are a SEQUENCE of long expressions compared lexicographically
  * (a row with ANY null key component never matches). Multi-key exists
  * for the salted skew-safe variant ([[graft.operators.AsofNative
  * .asofJoinSkewSafe]]): (key, salt) clusters a hot key's left rows
  * across salt buckets while the replicated right side keeps the merge
  * semantics exact.
  *
  * Why a custom plan: declaratively this is a (range-predicated) join
  * followed by a per-left-row argmax — at least one extra aggregation
  * shuffle after the join shuffle, with the join output inflated by
  * every EARLIER right match before argmax throws them away. The
  * physical operator instead asks EnsureRequirements for co-partitioned
  * children sorted by (keys..., time): one exchange per side and a
  * single streaming merge pass per partition, no intermediate
  * inflation. This is the sort-merge-join shape with a "remember the
  * last qualifying right row" cursor instead of a buffered equi-match.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    strategyHint: AsofStrategyHint = AsofAuto) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    s"as-of key arity mismatch: ${leftKeys.size} vs ${rightKeys.size}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical-strategy choice for the as-of join. [[AsofAuto]] mirrors
  * Spark's equi-join selection: broadcast the right side when its
  * estimated size fits `spark.sql.autoBroadcastJoinThreshold`,
  * otherwise co-partition and merge. */
sealed trait AsofStrategyHint
case object AsofAuto extends AsofStrategyHint
case object AsofMerge extends AsofStrategyHint
case object AsofBroadcast extends AsofStrategyHint

/** Planner strategy mapping the logical as-of join to its physical
  * operator (injected by [[graft.GraftExtensions]]). The fact-dim
  * shape (huge left, small right) gets the broadcast variant — the
  * left side then needs NO exchange and NO sort, which at 100 TB is
  * the difference between a metadata-cost enrichment and shuffling
  * the whole fact table. */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lks, rks, lt, rt, tb, hint) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val broadcast = hint match {
        case AsofBroadcast => true
        case AsofMerge => false
        case AsofAuto => threshold > 0 && r.stats.sizeInBytes <= threshold
      }
      if (broadcast)
        BroadcastAsofJoinExec(planLater(l), planLater(r), lks, rks, lt, rt, tb) :: Nil
      else
        AsofJoinExec(planLater(l), planLater(r), lks, rks, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

private[plans] object AsofKeys {
  /** Evaluate bound key expressions into `out`; false if any is null. */
  def eval(bound: Array[Expression], row: InternalRow, out: Array[Long]): Boolean = {
    var i = 0
    while (i < bound.length) {
      val v = bound(i).eval(row)
      if (v == null) return false
      out(i) = v.asInstanceOf[Long]
      i += 1
    }
    true
  }

  /** Lexicographic compare of equal-length key vectors. */
  def compare(a: Array[Long], b: Array[Long]): Int = {
    var i = 0
    while (i < a.length) {
      if (a(i) < b(i)) return -1
      if (a(i) > b(i)) return 1
      i += 1
    }
    0
  }

  /** Hashable key object for the broadcast index: a boxed Long for the
    * common single-key case, an element-wise-equal IndexedSeq otherwise. */
  def keyObject(k: Array[Long]): AnyRef =
    if (k.length == 1) java.lang.Long.valueOf(k(0))
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(k.clone())
}

/** Physical merge as-of join. Requires both children clustered on the
  * keys (EnsureRequirements co-partitions them, exactly as for a
  * sort-merge join) and sorted by (keys..., time [, tiebreaks]); emits
  * one output row per left row in left order. Key and time expressions
  * must be LongType (the df-level API casts); null key or time on
  * either side never matches (left rows still emit, right-padded with
  * nulls — left-outer semantics).
  *
  * AQE note (spec-verified, and confirmed against Spark 4.1's
  * CoalesceShufflePartitions.childrenNeedCompatiblePartitioning —
  * true for every multi-child node except Union / CartesianProduct /
  * broadcast joins): both child shuffles land in ONE coalesce group,
  * so AQE either coalesces them with identical partition specs or
  * leaves both alone — coalescing never needs disabling and the
  * children always arrive with equal partition counts. The require()
  * below is an invariant assertion, not an expected path.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // right side additionally sorts by the tiebreaks so "last qualifying
  // row" IS the argmax of (time, tiebreaks...)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTiebreak.map(SortOrder(_, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = leftKeys.map(BindReferences.bindReference(_, left.output)).toArray
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = rightKeys.map(BindReferences.bindReference(_, right.output)).toArray
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val arity = leftKeys.size
    val rightArity = right.output.size
    val outAttrs = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of merge children diverged to ${lRdd.getNumPartitions} vs " +
        s"${rRdd.getNumPartitions} partitions — EnsureRequirements should " +
        "have co-partitioned them and AQE never coalesces beneath a " +
        "distribution-requiring custom node (AsofNativeSpec pins this); " +
        "an injected or hand-built physical plan is violating the contract")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      val lk = new Array[Long](arity)
      val rk = new Array[Long](arity)
      // cursor state: the best (= latest-so-far) right row for bestKey
      var best: InternalRow = null
      var bestKey: Array[Long] = null
      var haveBest = false
      lIter.map { l =>
        val lt = ltB.eval(l)
        if (!AsofKeys.eval(lkB, l, lk) || lt == null) proj(joined(l, nullRight))
        else {
          val ltL = lt.asInstanceOf[Long]
          if (haveBest && AsofKeys.compare(bestKey, lk) != 0) {
            haveBest = false; best = null
          }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            if (!AsofKeys.eval(rkB, rBuf.head, rk)) rBuf.next() // null key never matches
            else {
              val c = AsofKeys.compare(rk, lk)
              if (c < 0) rBuf.next() // stale key: discard
              else if (c == 0) {
                val rt = rtB.eval(rBuf.head)
                if (rt == null) rBuf.next() // null time never matches
                else if (rt.asInstanceOf[Long] <= ltL) {
                  // qualifying and sorted ascending -> later rows are
                  // better; keep overwriting (copy: source rows reused)
                  best = rBuf.next().copy(); bestKey = lk.clone(); haveBest = true
                } else advancing = false // future right row: stop here
              } else advancing = false // right is past this key
            }
          }
          if (haveBest && AsofKeys.compare(bestKey, lk) == 0) proj(joined(l, best))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}

/** Broadcast as-of join for the fact-dim shape: the right side is
  * broadcast whole (IdentityBroadcastMode) and indexed ONCE PER
  * EXECUTOR as key -> time-sorted rows; each left row binary-searches
  * for the last right row with time <= its own. The left child keeps its
  * partitioning AND ordering — no exchange, no sort — so a 100 TB
  * fact scan pays only the per-row probe, exactly like a broadcast
  * hash join. Same semantics as [[AsofJoinExec]] (left outer, null
  * keys/times never match, tiebreaks ascending, last wins).
  */
object BroadcastAsofJoinExec {
  private type Index = java.util.HashMap[AnyRef, (Array[Long], Array[InternalRow])]
  // Keyed by (application id, broadcast id) — each task deserializes
  // its own Broadcast WRAPPER, so object identity never repeats but
  // the id does; and broadcast ids RESTART with a new SparkContext in
  // the same JVM, so id alone could serve a stale index from a
  // previous context (wrong join results). Small LRU bound: an entry
  // outliving its broadcast costs one dim index; read-only after
  // construction so concurrent tasks share it safely.
  // Lazy holder so the map lock is held only for map MUTATION, never
  // for the index build itself: concurrent tasks of the SAME broadcast
  // serialize on the holder's lazy val (one build), while tasks of an
  // UNRELATED as-of join (different broadcast) proceed without ever
  // waiting on another join's sort (r9 review fix).
  private final class Holder(build0: () => Index) {
    lazy val value: Index = build0()
  }
  private val indexCache =
    new java.util.LinkedHashMap[String, Holder](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Holder]): Boolean = size() > 8
    }

  private[plans] def indexFor(
      bc: org.apache.spark.broadcast.Broadcast[Array[InternalRow]])(
      build: => Index): Index = {
    val key = s"${org.apache.spark.SparkEnv.get.conf.getAppId}:${bc.id}"
    val holder = indexCache.synchronized {
      val cached = indexCache.get(key)
      if (cached != null) cached
      else { val h = new Holder(() => build); indexCache.put(key, h); h }
    }
    holder.value
  }
}

case class BroadcastAsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val lkB = leftKeys.map(BindReferences.bindReference(_, left.output)).toArray
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = rightKeys.map(BindReferences.bindReference(_, right.output)).toArray
    val rtB = BindReferences.bindReference(rightTime, right.output)
    // (time, tiebreaks...) ascending, pre-bound; the generated ordering
    // itself is NOT serializable, so ship the bound SortOrders and
    // generate per partition
    val boundOrder = (rightTime +: rightTiebreak).map(e =>
      SortOrder(BindReferences.bindReference(e, right.output), Ascending))
    val arity = leftKeys.size
    val rightArity = right.output.size
    val outAttrs = output
    left.execute().mapPartitions { lIter =>
      // index built ONCE PER EXECUTOR per broadcast (size-8 LRU keyed
      // by appId:broadcastId — see indexCache; an entry can outlive
      // its broadcast until 8 newer ones evict it, costing at most 8
      // pinned dim indexes per executor), so a thousand tasks against
      // a large dim don't re-sort it a thousand times
      val byKey = BroadcastAsofJoinExec.indexFor(bcast) {
        val ordering = RowOrdering.create(boundOrder, Nil)
        val idx = new java.util.HashMap[AnyRef, (Array[Long], Array[InternalRow])]()
        val groups = new java.util.HashMap[AnyRef, scala.collection.mutable.ArrayBuffer[InternalRow]]()
        val kbuf = new Array[Long](arity)
        bcast.value.foreach { r =>
          if (AsofKeys.eval(rkB, r, kbuf) && rtB.eval(r) != null) {
            groups.computeIfAbsent(AsofKeys.keyObject(kbuf),
              _ => scala.collection.mutable.ArrayBuffer.empty[InternalRow]) += r
          }
        }
        groups.forEach { (k, buf) =>
          val sorted = buf.sortWith((a, b) => ordering.compare(a, b) < 0).toArray
          idx.put(k, (sorted.map(rtB.eval(_).asInstanceOf[Long]), sorted))
        }
        idx
      }
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val kbuf = new Array[Long](arity)
      lIter.map { l =>
        val lt = ltB.eval(l)
        var best: InternalRow = null
        if (lt != null && AsofKeys.eval(lkB, l, kbuf)) {
          val g = byKey.get(AsofKeys.keyObject(kbuf))
          if (g != null) {
            val (times, rows) = g
            val ltL = lt.asInstanceOf[Long]
            // last index with times(i) <= ltL; ties already resolved by
            // the sort (later tiebreaks sit later in the array)
            var lo = 0; var hi = times.length - 1; var res = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= ltL) { res = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (res >= 0) best = rows(res)
          }
        }
        if (best != null) proj(joined(l, best)) else proj(joined(l, nullRight))
      }
    }
  }
}
