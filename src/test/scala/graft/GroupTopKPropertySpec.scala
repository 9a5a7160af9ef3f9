package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK

/** Randomized equivalence property for the native bounded-heap
  * operator (the ShardedCumPropertySpec discipline applied to
  * GroupTopK): for any mix of NULL group keys, NULL / ±0.0 / NaN
  * order values and duplicate order keys broken by a unique id,
  * groupTopK must return EXACTLY the rows of the single-reducer
  * `row_number() <= k` window plan — same comparator semantics in
  * the partial heaps, the merge phase, and WindowExec's sort.
  */
class GroupTopKPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private val schema = StructType(Seq(
    StructField("g", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true),
    StructField("id", LongType, nullable = false)))

  test("groupTopK == window row_number<=k on null/±0.0/NaN-heavy data") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      val n = 300 + rnd.nextInt(500)
      val k = 1 + rnd.nextInt(5)
      val rows = Seq.tabulate(n) { i =>
        val g: String = if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(7)}"
        val v: java.lang.Double = rnd.nextInt(10) match {
          case 0 => null
          case 1 => 0.0
          case 2 => -0.0
          case 3 => Double.NaN
          case _ => rnd.nextInt(40) / 10.0 // heavy ties
        }
        Row(g, v, i.toLong)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 7), schema)
      for (desc <- Seq(true, false)) {
        val got = TopK.groupTopK(df, Seq("g"), Seq(("v", desc), ("id", false)), k)
        val ord = if (desc) col("v").desc else col("v").asc
        val w = Window.partitionBy(col("g")).orderBy(ord, col("id"))
        val want = df.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k).drop("rk")
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          s"trial=$trial k=$k desc=$desc diverged from the window oracle")
      }
    }
  }

  test("groupTopK keeps every row when k exceeds the largest group") {
    val df = spark.range(100).select(
      (col("id") % 4).cast("string").as("g"),
      (col("id") % 13).cast("double").as("v"), col("id"))
    val got = TopK.groupTopK(df, Seq("g"), Seq(("v", true), ("id", false)), 1000)
    assert(got.count() === 100)
  }
}
