package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShardedCum

/** Pins the r5 sweep-line rewrite of q110_session_overlap: the
  * cumulative-count plan must be row-identical to the r4 binned pair
  * self-join it replaced (which is itself the shape of the DuckDB
  * oracle), and the ShardedCum prefix sum must equal a single-window
  * cumulative sum at any shard count.
  */
class SweepLineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ShardedCum.cumSums equals single-window cumulative sum (1/4/32 shards)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 997, i % 7))
      .toDF("k", "w")
    val w = Window.orderBy(col("k"), col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("w")).over(w))
      .groupBy("k").agg(max("cum").as("cum_at_k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (shards <- Seq(1, 4, 32)) {
      val got = ShardedCum.cumSums(df, Nil, Seq(col("k"), col("w")),
          Seq(col("w") -> "cum"), shards)
        .groupBy("k").agg(max("cum").as("cum_at_k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"shards=$shards diverged")
    }
  }

  test("ShardedCum per-group cums equal per-group window cums") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i % 3, (i * 40503L) % 499, i % 5))
      .toDF("g", "k", "w")
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("w")).over(w))
      .groupBy("g", "k").agg(max("cum").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = ShardedCum.cumSums(df, Seq("g"), Seq(col("k")),
        Seq(col("w") -> "cum"), 8)
      .groupBy("g", "k").agg(max("cum").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("q110 sweep-line is row-identical to the pair-join formulation") {
    val sess = SparkEntry.queries("q27_sessionize")(spark, sf)
      .select(col("user_id"), col("session_id"),
        col("t_start"), col("t_end"))
    // r4 formulation (= the oracle's shape): binned pair self-join.
    val binned = sess.withColumn("bin",
      explode(sequence(date_trunc("hour", col("t_start")), col("t_end"),
        expr("interval 1 hour"))))
    val a = binned.select(col("bin"), col("user_id").as("u1"),
      col("session_id").as("s1"), col("t_start").as("a_start"),
      col("t_end").as("a_end"))
    val b = binned.select(col("bin"), col("user_id").as("u2"),
      col("session_id").as("s2"), col("t_start").as("b_start"),
      col("t_end").as("b_end"))
    val pairs = a.join(b, col("u1") < col("u2") &&
        a("bin") === b("bin") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("u1"), col("s1"), col("u2"), col("s2")).distinct()
    val expected = pairs
      .select(col("u1").as("user_id"), col("s1").as("session_id"))
      .unionAll(pairs.select(col("u2").as("user_id"),
        col("s2").as("session_id")))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(expected.nonEmpty, "test corpus produced no overlaps")
    val got = SparkEntry.queries("q110_session_overlap")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"sweep-line diverged: only-sweep=${(got.toSet -- expected.toSet).take(5)} " +
        s"only-pairs=${(expected.toSet -- got.toSet).take(5)}")
  }

  test("q110 plan has no session-pair join (the r4 quadratic shape)") {
    val plan = SparkEntry.queries("q110_session_overlap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin") ||
      !plan.contains("a_start"),
      "plan still contains the pair self-join")
  }
}
