package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShardedCum

/** Randomized null-safety property for ShardedCum: any mix of null
  * group keys, null order keys and null weights must reproduce the
  * single-reducer window plan row-for-row — including NULL-ness: the
  * running sum is NULL exactly while the group prefix has zero
  * non-null weights. Pins two r9 fixes: the null-safe offset join (a
  * plain equi-join dropped every null-group row) and the non-null
  * count tracking (a shard whose local prefix was all-null emitted
  * NULL + offset = NULL where the window plan carries the preceding
  * shards' sum). Order keys are made unique with the row id so the
  * oracle is deterministic under ties.
  */
class ShardedCumNullSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** ~10% nulls in group/order/first weight; heavier (≈40%) nulls in
    * the second weight so all-null shard prefixes actually occur. */
  private def corpus(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (1 to n).map { i =>
      (i.toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3)),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(50)),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(9).toLong),
        if (rnd.nextInt(5) > 2) None else Some(rnd.nextInt(4).toLong))
    }
    // guaranteed all-null-weight PREFIX per group: null k sorts first
    // (nulls-first asc) and a negative id wins the (k, id) tie-break
    // against every random null-k row, so the NULL-cum branch is
    // always exercised
    val prefix = (Seq[Option[Int]](None, Some(0), Some(1), Some(2)))
      .zipWithIndex.map { case (g, j) =>
        (-(j + 1).toLong, g, None: Option[Int], None: Option[Long],
          None: Option[Long])
      }
    (rows ++ prefix).toDF("id", "g", "k", "w", "v")
  }

  private def collectCums(df: DataFrame): Map[Long, (Option[Long], Option[Long])] =
    df.select(col("id"), col("cw"), col("cv")).collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("cw")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("cv")).map(_.longValue))).toMap

  private def oracle(df: DataFrame): Map[Long, (Option[Long], Option[Long])] = {
    val w = Window.partitionBy(col("g")).orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    collectCums(df.withColumn("cw", sum(col("w")).over(w))
      .withColumn("cv", sum(col("v")).over(w)))
  }

  test("cumSums with null groups/orders/weights equals the window oracle") {
    val df = corpus(seed = 7L, n = 4000)
    val nullG = df.filter(col("g").isNull).count()
    assert(nullG > 0, "corpus must exercise null group keys")
    val expected = oracle(df)
    assert(expected.values.exists(_._2.isEmpty),
      "corpus must exercise an all-null group prefix (NULL cum)")
    for (shards <- Seq(1, 7, 32)) {
      val got = collectCums(ShardedCum.cumSums(df, Seq("g"),
        Seq(col("k"), col("id")),
        Seq(col("w") -> "cw", col("v") -> "cv"), shards))
      assert(got.size == expected.size,
        s"shards=$shards lost rows: ${expected.size} -> ${got.size} " +
          s"($nullG null-group rows in corpus)")
      val diff = got.keySet.filter(id => got(id) != expected(id))
      assert(diff.isEmpty, s"shards=$shards diverged on ${diff.size} rows, " +
        s"e.g. ${diff.take(3).map(id => (id, got(id), expected(id)))}")
    }
  }

  test("cumSumsBucketed with null groups and null buckets equals the oracle") {
    val df = corpus(seed = 11L, n = 4000)
    val expected = oracle(df)
    // bucket = k div 8: monotone in the order key; null k -> null
    // bucket (sorts first, exactly where orderBy puts null k)
    val got = collectCums(ShardedCum.cumSumsBucketed(df, Seq("g"),
      Seq(col("k"), col("id")), expr("k div 8"),
      Seq(col("w") -> "cw", col("v") -> "cv")))
    assert(got.size == expected.size,
      s"lost rows: ${expected.size} -> ${got.size}")
    val diff = got.keySet.filter(id => got(id) != expected(id))
    assert(diff.isEmpty, s"diverged on ${diff.size} rows, " +
      s"e.g. ${diff.take(3).map(id => (id, got(id), expected(id)))}")
  }
}
