package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the
  * `OPTIMIZE ... ZORDER BY` shape (public technique: Morton-order
  * clustering, as in Delta Lake / Iceberg / the classic z-order
  * literature), built from plain Spark primitives.
  *
  * Why at 100 TB: parquet row-group and file pruning works off
  * per-file min/max stats. A layout sorted by ONE column gives tight
  * stats on that column only — a filter on any other column still
  * touches every file. Z-ordering interleaves the bit-planes of
  * several columns' RANKS, so files cover small hyper-rectangles of
  * the key space and selective filters on ANY clustered column (or
  * a conjunction) prune most files.
  *
  * Plan shape: one pass to sample per-column quantile boundaries
  * (`approx_percentile`, a mergeable sketch aggregation collected as
  * `buckets−1` doubles per column — driver state is KB-sized), then a
  * scan-side bucket rank per column (a codegen'd higher-order fold
  * over the broadcast boundary array — no shuffle, no join), bit
  * interleave into the z-value, and ONE `repartitionByRange` +
  * `sortWithinPartitions` on it (a range shuffle is what any layout
  * rewrite costs; nothing here is extra).
  *
  * Quantile-rank bucketing (rather than min/max linear scaling) makes
  * the z-cells equi-populated under ANY value distribution — a
  * power-law column can't collapse the grid onto a few codes.
  */
object Layout {

  /** Double image of a clustering column. Date/timestamp go through
    * their epoch integers FIRST — a raw date→double cast fails
    * analysis under ANSI (the session default) and nulls out under
    * non-ANSI, silently dropping the column from the clustering key
    * (r9 review fix; the same normalization AsofNative applies). */
  private def numericImage(dt: org.apache.spark.sql.types.DataType,
      c: Column): Column = dt match {
    case org.apache.spark.sql.types.DateType => unix_date(c).cast("double")
    case org.apache.spark.sql.types.TimestampType =>
      unix_micros(c).cast("double")
    case _ => c.cast("double")
  }

  /** Per-column quantile boundaries: `buckets − 1` internal cut
    * points. One aggregation over the clustering columns only. */
  private def boundaries(df: DataFrame, cols: Seq[String],
      buckets: Int): Map[String, Array[Double]] = {
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val aggs = cols.map(c => percentile_approx(
      numericImage(df.schema(c).dataType, col(c)),
      lit(qs.toArray), lit(10000)).as(c))
    val row = df.select(aggs: _*).collect().head
    // percentile_approx returns null on an empty frame or an all-null
    // column — treat such a column as CONSTANT (empty boundary set →
    // bucket rank 0 for every row) instead of NPE-ing: the z-value
    // degrades gracefully to clustering on the remaining columns.
    cols.map { c =>
      val i = row.fieldIndex(c)
      c -> (if (row.isNullAt(i)) Array.empty[Double]
            else row.getSeq[Double](i).toArray)
    }.toMap
  }

  /** Scan-side bucket rank of an already-double `c` against
    * broadcast-literal boundaries: count of cut points ≤ value, a
    * codegen'd fold — O(buckets) comparisons per row, no join, no
    * shuffle. */
  private def bucketOf(c: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0) // constant / all-null column (see boundaries)
    else {
      val arr = array(bounds.map(lit(_)): _*)
      aggregate(arr, lit(0),
        (acc, b) => acc + when(c >= b, 1).otherwise(0))
    }

  /** Morton interleave of per-column bucket ranks (low bit first:
    * z = Σ_bit Σ_col bit(col, b) << (b·ncols + col)). `bits` bit-planes
    * per column; ncols·bits ≤ 63. */
  private def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.length
    val terms = for {
      b <- 0 until bits
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ + _)
  }

  /** The z-value column for `cols` over `df`'s own quantile grid:
    * `2^bitsPerCol` equi-populated buckets per column, Morton
    * interleaved. Exposed for tests and for callers who want the
    * z-value without the shuffle (e.g. to bucket-sample). */
  def zValue(df: DataFrame, cols: Seq[String],
      bitsPerCol: Int = 8): (DataFrame, Column) = {
    require(cols.nonEmpty && cols.size * bitsPerCol <= 63,
      s"need 1..N cols with cols*bits <= 63: ${cols.size} * $bitsPerCol")
    val bds = boundaries(df, cols, 1 << bitsPerCol)
    val z = interleave(cols.map(c => bucketOf(
      numericImage(df.schema(c).dataType, col(c)), bds(c))), bitsPerCol)
    (df, z.as("__z"))
  }

  /** Rewrite `df` into a z-ordered layout: range-partition on the
    * z-value into `numFiles` output partitions, sort inside each, drop
    * the helper column. Write the result with any sink — each output
    * file then covers one contiguous z-range = one small
    * hyper-rectangle of the clustered key space, which is exactly what
    * min/max pruning needs. */
  def zorder(df: DataFrame, cols: Seq[String], numFiles: Int,
      bitsPerCol: Int = 8): DataFrame = {
    // a non-castable column (string, array, ...) would cast("double")
    // to all-null, hit the empty-boundary path, and SILENTLY stop
    // clustering on that column — fail loudly instead
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.DateType ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.BooleanType,
        s"zorder column '$c' has non-numeric type $dt — cast or encode " +
          "it first (a raw cast would null out and drop the column " +
          "from the clustering key)")
    }
    val (base, z) = zValue(df, cols, bitsPerCol)
    base.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
