package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: per-partition bounding boxes must be small on ALL
  * clustered dimensions (that is the entire point — a single-column
  * sort gives tight bounds on one dimension and full-range bounds on
  * every other), partitions stay roughly equi-populated, and the
  * z-value respects its bit budget.
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  // two independent uniform dimensions — the adversarial case for a
  // single-column sort
  private lazy val df = spark.range(100000).select(
    ((col("id") * 2654435761L) % 10000L).as("a"),
    ((col("id") * 40503L + 7L) % 10000L).as("b"))

  /** mean per-partition (max−min)/range for each dim, under `layout`. */
  private def spreads(layout: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val stats = layout
      .withColumn("p", spark_partition_id())
      .groupBy(col("p"))
      .agg(((max(col("a")) - min(col("a"))) / 10000.0).as("sa"),
        ((max(col("b")) - min(col("b"))) / 10000.0).as("sb"))
      .agg(avg(col("sa")), avg(col("sb"))).collect().head
    (stats.getDouble(0), stats.getDouble(1))
  }

  test("z-order files cover small boxes on BOTH dims; single sort does not") {
    val (za, zb) = spreads(Layout.zorder(df, Seq("a", "b"), numFiles = 16))
    val (sa, sb) = spreads(df.repartitionByRange(16, col("a"))
      .sortWithinPartitions(col("a")))
    assert(sa < 0.15, s"single-sort is tight on its own dim: $sa")
    assert(sb > 0.9, s"single-sort must cover ~full b-range: $sb")
    assert(za < 0.5 && zb < 0.5,
      s"z-order must bound BOTH dims: a=$za b=$zb")
    // 16 files over a 2-dim grid -> each should cover ~1/4 per dim;
    // allow generous slack over the ideal 0.25
    assert(za + zb < sa + sb,
      s"z-order total spread must beat single-sort: ${za + zb} vs ${sa + sb}")
  }

  test("z-order partitions stay roughly equi-populated (quantile-rank grid)") {
    val counts = Layout.zorder(df, Seq("a", "b"), numFiles = 16)
      .withColumn("p", spark_partition_id())
      .groupBy(col("p")).count().collect().map(_.getLong(1))
    assert(counts.length >= 8, s"range partitioner collapsed: ${counts.length}")
    assert(counts.max <= 4 * (100000 / counts.length),
      s"a partition is badly overloaded: ${counts.max}")
  }

  test("z-value stays inside its bit budget and is filter-pushable") {
    val (base, z) = Layout.zValue(df, Seq("a", "b"), bitsPerCol = 8)
    val mx = base.select(z).agg(max(col("__z"))).collect().head.getLong(0)
    assert(mx >= 0 && mx < (1L << 16), s"z out of range: $mx")
  }

  test("empty frames and all-null columns degrade gracefully (no NPE)") {
    // empty input: percentile_approx returns null boundaries — zorder
    // must return an empty frame, not NPE from inside boundaries()
    assert(Layout.zorder(df.limit(0), Seq("a", "b"), numFiles = 4).count() == 0L)
    // an entirely-null clustering column is treated as CONSTANT: the
    // z-value degrades to clustering on the remaining columns
    val withNull = df.withColumn("b", lit(null).cast("long"))
    val laid = Layout.zorder(withNull, Seq("a", "b"), numFiles = 8)
    assert(laid.count() == 100000L)
    // and the layout still bounds the non-null dim like a plain sort
    val sa = laid.withColumn("p", spark_partition_id())
      .groupBy(col("p"))
      .agg(((max(col("a")) - min(col("a"))) / 10000.0).as("sa"))
      .agg(avg(col("sa"))).collect().head.getDouble(0)
    assert(sa < 0.3, s"null-column layout lost clustering on 'a': $sa")
  }
}
