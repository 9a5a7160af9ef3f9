package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator group-wise top-k — the second custom plan in the
  * suite (§6.5 ladder, rung (c)), for the single most common pattern
  * in the catalog: "keep each group's k best rows" (per-domain quotas,
  * per-stratum samples, vocabulary heads, per-query result lists).
  *
  * Why a custom plan: declaratively this is
  * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k`, and Spark's
  * physical plan for it shuffles EVERY row to its group's reducer and
  * SORTS entire partitions — at 100 TB, a full-data exchange + sort to
  * keep 30 rows per domain. The custom operator runs a bounded
  * per-group heap in TWO phases: a partial pass inside each input
  * partition (no distribution requirement — this is the top-k
  * analogue of map-side combine) reduces each partition to ≤ k rows
  * per group, THEN the exchange moves only those survivors, and the
  * final pass merges them. Shuffle volume drops from |rows| to
  * ≤ k × partitions × |groups present|, and nothing is ever globally
  * sorted — heap maintenance is O(log k) per row against the sort's
  * O(log |partition|).
  *
  * Determinism: callers must make the ordering TOTAL (include a
  * tiebreak column); results are then exactly the window plan's rows
  * regardless of partitioning — spec-proved, and the gated query
  * hash-matches a ROW_NUMBER oracle (an exact gate, not rows-only:
  * bounded heaps with a total order lose nothing).
  */
case class GroupTopKPlan(
    child: LogicalPlan,
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int) extends UnaryNode {
  require(k > 0, s"group top-k k must be positive: $k")
  require(groupKeys.nonEmpty, "group top-k needs at least one group key")
  require(order.nonEmpty, "group top-k needs an ordering")

  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupTopKPlan = copy(child = newChild)
}

class GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(c, g, o, k) =>
      GroupTopKExec(g, o, k, partial = false,
        GroupTopKExec(g, o, k, partial = true, planLater(c))) :: Nil
    case _ => Nil
  }
}

/** One heap phase. `partial = true` runs inside whatever partitioning
  * the child has (the combine); `partial = false` requires clustering
  * on the group keys (EnsureRequirements inserts the exchange between
  * the two — carrying only the partial survivors). Each group's rows
  * emit in order (best first). */
case class GroupTopKExec(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupKeys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupTopKExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupB = groupKeys.map(BindReferences.bindReference(_, childOutput))
    val orderB = order.map(BindReferences.bindReference(_, childOutput))
    val kk = k
    // Memory bound (r9, advisor finding): the heap map holds k rows per
    // DISTINCT group seen in the partition — unbounded when group
    // cardinality approaches row count (e.g. grouping by doc_id). The
    // PARTIAL phase therefore flushes: when buffered rows exceed
    // flushRows, emit every heap and restart empty. Each flush may
    // re-emit up to k rows for a group seen again later, but the final
    // phase merges all partial batches of a group, so results are
    // unchanged — the cost of a flush is only extra exchange rows,
    // bounded by k x flushes, and the map never exceeds ~flushRows.
    // The FINAL phase cannot flush (a group's survivors must be merged
    // in one place); its bound is k x |groups in this hash partition| —
    // the k-sized analogue of a hash aggregate's per-partition state,
    // shrinkable by raising spark.sql.shuffle.partitions.
    val flushRows =
      if (!partial) Long.MaxValue
      else conf.getConfString("spark.graft.topk.flushRows", "1048576").toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupB)
      val ordering = RowOrdering.create(orderB, Seq.empty)
      // head of the heap = WORST retained row (reverse ordering)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]
      var nBuffered = 0L
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        val pq = heaps.get(key) match {
          case Some(q) => q
          case None =>
            val q = new java.util.PriorityQueue[InternalRow](
              math.min(kk, 16), ordering.reverse)
            heaps.put(key.copy(), q)
            q
        }
        if (pq.size < kk) { pq.add(row.copy()); nBuffered += 1 }
        else if (ordering.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.add(row.copy())
        }
      }
      def drain(): Iterator[InternalRow] = {
        val qs = heaps.values.toArray
        heaps.clear(); nBuffered = 0L
        qs.iterator.flatMap { pq =>
          val arr = new Array[InternalRow](pq.size)
          var i = arr.length - 1
          while (i >= 0) { arr(i) = pq.poll(); i -= 1 } // drain worst-first
          arr.iterator
        }
      }
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) {
            var flushed = false
            while (iter.hasNext && !flushed) {
              insert(iter.next())
              if (nBuffered >= flushRows) { out = drain(); flushed = true }
            }
            if (!flushed && !iter.hasNext) out = drain()
          }
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          out.next()
        }
      }
    }
  }
}
