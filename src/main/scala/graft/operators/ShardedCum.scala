package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import graft.GraftSession.ckpt
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-phase sharded cumulative (prefix) sums — the scale-safe
  * replacement for `Window.partitionBy(lowCardinality).orderBy(...)`
  * running totals, whose sorted stream otherwise funnels through one
  * reducer per group.
  *
  * Phase 1: `repartitionByRange` over (group, order) keys splits the
  * globally-sorted stream into `shards` contiguous ranges; each range
  * computes a LOCAL running sum with an ordered window partitioned by
  * (group, shard). Phase 2: per-(group, shard) totals — at most
  * groups x shards rows — get a tiny prefix window and are broadcast
  * back; the global cumulative value is local + offset of the
  * preceding shards of the same group.
  *
  * Correctness notes:
  *  - RangePartitioner assigns a row purely by its key, so rows with
  *    identical (group, order) keys always share a shard; tie behavior
  *    is exactly the within-shard window's, same as the single-reducer
  *    plan it replaces.
  *  - `spark_partition_id()` is read BEFORE any downstream exchange,
  *    while the data still sits in the range layout, and from there on
  *    `_shard` is an ordinary column — later hash exchanges regroup by
  *    its value, not by physical partition.
  * Scale shape: two linear shuffles of the input (range + hash) plus a
  * broadcast of the offsets table; no single-reducer stage anywhere.
  */
object ShardedCum {

  /** Appends one cumulative-sum column per (weight, alias) pair, each
    * cumulated in (orderCols) order within each groupCols group (pass
    * Nil for a global cumulative sum). Temp columns are dropped; the
    * output carries the input columns + the alias columns.
    */
  def cumSums(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      sums: Seq[(Column, String)],
      shards: Int = 32): DataFrame = {
    val groupC = groupCols.map(col)
    val rangeCols = groupC ++ orderCols
    // ckpt PINS the shard assignment: both the local-window branch and
    // the totals branch read `_shard` from the SAME materialized
    // layout. Without it the two physical subtrees can prune the range
    // exchange's child differently, defeat ReuseExchange, and execute
    // the range SAMPLING twice — different boundary samples would give
    // a row _shard=5 in one branch while its offsets were computed
    // under a layout where it fell in shard 6 (silently wrong sums).
    val sharded = ckpt(df.repartitionByRange(shards, rangeCols: _*)
      .withColumn("_shard", spark_partition_id()))
    val localW = Window
      .partitionBy(groupC :+ col("_shard"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _lcnt tracks NON-NULL weights seen so far: SQL's running sum is
    // NULL only while the whole group prefix is null-valued, and a
    // shard whose local prefix is all-null must still surface the
    // preceding shards' sum (NULL + offset would null it out)
    val withLocal = sums.foldLeft(sharded) { case (d, (c, name)) =>
      d.withColumn(s"_local_$name", sum(c).over(localW))
        .withColumn(s"_lcnt_$name", count(c).over(localW))
    }
    // Per-(group, shard) totals ride the same exchange (ReuseExchange);
    // the offsets table is <= groups x shards rows — broadcast class.
    val totAggs = sums.flatMap { case (c, n) =>
      Seq(sum(c).as(s"_tot_$n"), count(c).as(s"_tcnt_$n")) }
    val totals = sharded
      .groupBy(groupC :+ col("_shard"): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val offW = Window.partitionBy(groupC: _*).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      (groupC :+ col("_shard")) ++ sums.flatMap { case (_, n) => Seq(
        coalesce(sum(col(s"_tot_$n")).over(offW), lit(0L)).as(s"_off_$n"),
        coalesce(sum(col(s"_tcnt_$n")).over(offW), lit(0L)).as(s"_offcnt_$n"))
      }: _*)
    // NULL-SAFE group join (<=>): Window.partitionBy keeps a null
    // group as its own partition, and this operator must agree — a
    // plain equi-join would silently drop every null-group row.
    val offsetsK = offsets.select(
      groupCols.map(c => col(c).as(s"_k_$c")) ++
        Seq(col("_shard").as("_k_shard")) ++
        sums.flatMap { case (_, n) =>
          Seq(col(s"_off_$n"), col(s"_offcnt_$n")) }: _*)
    val cond = (groupCols.map(c => col(c) <=> col(s"_k_$c")) :+
      (col("_shard") === col("_k_shard"))).reduce(_ && _)
    val joined = withLocal.join(broadcast(offsetsK), cond, "inner")
    // NULL iff zero non-null weights in the whole group prefix —
    // exactly the single-window plan's value (`when` with no otherwise
    // keeps the branch's type)
    val withCums = sums.foldLeft(joined) { case (d, (_, name)) =>
      d.withColumn(name,
        when(col(s"_lcnt_$name") + col(s"_offcnt_$name") > 0,
          coalesce(col(s"_local_$name"), lit(0L)) + col(s"_off_$name")))
    }
    withCums.drop("_shard" +: "_k_shard" +: groupCols.map(c => s"_k_$c") ++:
      sums.flatMap { case (_, n) =>
        Seq(s"_local_$n", s"_off_$n", s"_lcnt_$n", s"_offcnt_$n") }: _*)
  }

  /** Sampling-free variant: the shard is an explicit BUCKET expression
    * the caller guarantees is monotone non-decreasing in the order key
    * (hour index for timestamps, floor(v/width) for numerics). That
    * removes `repartitionByRange`'s sampling job — the main chain is
    * one hash exchange on (group, bucket) + one ordered window, and the
    * offsets side is a map-side-combinable agg over the same input
    * (groups x buckets rows, broadcast class). Preferred when a natural
    * bucketing exists; per-bucket volume bounds the window partition
    * (e.g. events per hour), so pick the bucket width accordingly.
    */
  def cumSumsBucketed(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      bucket: Column,
      sums: Seq[(Column, String)]): DataFrame = {
    val groupC = groupCols.map(col)
    val withB = df.withColumn("_bucket", bucket)
    val localW = Window
      .partitionBy(groupC :+ col("_bucket"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same non-null-count tracking as [[cumSums]] (see there)
    val withLocal = sums.foldLeft(withB) { case (d, (c, name)) =>
      d.withColumn(s"_local_$name", sum(c).over(localW))
        .withColumn(s"_lcnt_$name", count(c).over(localW))
    }
    val totAggs = sums.flatMap { case (c, n) =>
      Seq(sum(c).as(s"_tot_$n"), count(c).as(s"_tcnt_$n")) }
    val totals = withB
      .groupBy(groupC :+ col("_bucket"): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val offW = Window.partitionBy(groupC: _*).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      (groupC :+ col("_bucket")) ++ sums.flatMap { case (_, n) => Seq(
        coalesce(sum(col(s"_tot_$n")).over(offW), lit(0L)).as(s"_off_$n"),
        coalesce(sum(col(s"_tcnt_$n")).over(offW), lit(0L)).as(s"_offcnt_$n"))
      }: _*)
    // null-safe on both the group cols AND the bucket (a bucket
    // expression can yield null — e.g. on a null order key)
    val offsetsK = offsets.select(
      groupCols.map(c => col(c).as(s"_k_$c")) ++
        Seq(col("_bucket").as("_k_bucket")) ++
        sums.flatMap { case (_, n) =>
          Seq(col(s"_off_$n"), col(s"_offcnt_$n")) }: _*)
    val cond = (groupCols.map(c => col(c) <=> col(s"_k_$c")) :+
      (col("_bucket") <=> col("_k_bucket"))).reduce(_ && _)
    val joined = withLocal.join(broadcast(offsetsK), cond, "inner")
    val withCums = sums.foldLeft(joined) { case (d, (_, name)) =>
      d.withColumn(name,
        when(col(s"_lcnt_$name") + col(s"_offcnt_$name") > 0,
          coalesce(col(s"_local_$name"), lit(0L)) + col(s"_off_$name")))
    }
    withCums.drop("_bucket" +: "_k_bucket" +: groupCols.map(c => s"_k_$c") ++:
      sums.flatMap { case (_, n) =>
        Seq(s"_local_$n", s"_off_$n", s"_lcnt_$n", s"_offcnt_$n") }: _*)
  }

  /** SQL-standard `NTILE(k)` bucket from a 1-based rank column `rnCol`
    * and a group-size column `nCol` (integer-typed column NAMES): the
    * first n%k buckets get one row more than the rest. Pure per-row
    * arithmetic — pairs with a [[cumSums]] `lit(1L)` rank to replace a
    * single-reducer `ntile(k).over(Window.orderBy(...))` plan. The
    * otherwise-branch's `div (n div k)` cannot divide by zero: when
    * n < k, cut == n, so every rank takes the then-branch (CASE
    * evaluates lazily, ANSI-safe — the q48 precedent).
    */
  def ntileFromRank(rnCol: String, nCol: String, k: Int): Column = {
    val cut = expr(s"($nCol div $k + 1) * ($nCol % $k)")
    when(col(rnCol) <= cut,
        expr(s"($rnCol - 1) div ($nCol div $k + 1) + 1"))
      .otherwise(expr(s"$nCol % $k + " +
        s"($rnCol - ($nCol div $k + 1) * ($nCol % $k) - 1) div ($nCol div $k) + 1"))
      .cast("int")
  }

  /** Global deterministic 1-based rank over a TOTAL order (the caller
    * must include a unique tiebreak in `orderCols`), range-sharded over
    * `shards` reducers — the scale-safe replacement for
    * `row_number().over(Window.orderBy(...))`, whose unpartitioned
    * window otherwise funnels the whole frame through ONE reducer.
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column], alias: String,
      shards: Int = 32): DataFrame =
    cumSums(df, Nil, orderCols, Seq((lit(1L), alias)), shards)
}
