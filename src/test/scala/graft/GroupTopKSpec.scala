package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK

/** The native group top-k plan: window-identical results under any
  * partitioning, the two-phase heap plan shape, and the point of the
  * whole exercise — the exchange carries only the partial survivors,
  * not the input.
  */
class GroupTopKSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def corpus(parts: Int) =
    spark.range(20000L)
      .select(pmod(col("id"), lit(40L)).as("g"),
        col("id").as("id"),
        pmod(col("id") * 2654435761L, lit(100000L)).as("score"))
      .repartition(parts)

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn").collect().map(_.toString).sorted
  }

  test("native top-k equals the window plan under any partitioning") {
    val k = 7
    val expect = windowed(corpus(4), k)
    Seq(1, 4, 13).foreach { parts =>
      val got = TopK.groupTopK(corpus(parts), Seq("g"),
        Seq(("score", true), ("id", false)), k).collect()
        .map(_.toString).sorted
      assert(got.sameElements(expect), s"parts=$parts diverged")
    }
  }

  test("partial-phase flush cap: tiny flushRows still window-identical") {
    // r9 advisor fix: with group cardinality ~ row count the partial
    // heap map is unbounded; the flush cap bounds it at ~flushRows
    // buffered rows per partition, re-emitting and restarting. Force
    // aggressive flushing (64 rows vs 5000 groups) and assert results
    // are STILL exactly the window plan's — flushes only add exchange
    // rows, never change the merged top-k.
    val k = 3
    val highCard = spark.range(20000L)
      .select(pmod(col("id"), lit(5000L)).as("g"), col("id"),
        pmod(col("id") * 2654435761L, lit(100000L)).as("score"))
      .repartition(4)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val expect = highCard.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn").collect().map(_.toString).sorted
    spark.conf.set("spark.graft.topk.flushRows", "64")
    try {
      val got = TopK.groupTopK(highCard, Seq("g"),
        Seq(("score", true), ("id", false)), k)
        .collect().map(_.toString).sorted
      assert(got.sameElements(expect), "flushing changed top-k results")
    } finally spark.conf.unset("spark.graft.topk.flushRows")
  }

  test("ambiguous column names throw instead of binding the first match") {
    val a = corpus(2)
    val joined = a.as("l").join(a.as("r"), Seq("id"))  // duplicate g, score
    val e = intercept[IllegalArgumentException] {
      TopK.groupTopK(joined, Seq("g"), Seq(("score", true)), 3)
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("skewed groups: one giant group still matches the window plan") {
    // 90% of rows in group 0
    val df = spark.range(10000L)
      .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("g"),
        col("id"), pmod(col("id") * 31L, lit(997L)).as("score"))
      .repartition(8)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn").collect().map(_.toString).sorted
    val got = TopK.groupTopK(df, Seq("g"), Seq(("score", true), ("id", false)), 5)
      .collect().map(_.toString).sorted
    assert(got.sameElements(expect))
  }

  test("plan shape: two heap phases, exchange carries only partial survivors") {
    val k = 7
    val df = TopK.groupTopK(corpus(16), Seq("g"),
      Seq(("score", true), ("id", false)), k)
    df.collect()
    // AQE wraps stages; collect() stops at stage boundaries, so walk
    // through AdaptiveSparkPlanExec/QueryStageExec by hand
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(s.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val plan = df.queryExecution.executedPlan
    val nodes = allNodes(plan)
    val heapNodes = nodes.collect {
      case e: graft.plans.GroupTopKExec => e }
    assert(heapNodes.length == 2, s"want partial+final, got:\n$plan")
    assert(heapNodes.count(_.partial) == 1 &&
      heapNodes.count(!_.partial) == 1)
    assert(plan.toString.contains("Exchange"), "exchange must sit between phases")
    // the exchange moved <= k rows per (group, input partition) —
    // 40 groups x 16 partitions x 7 = 4480 max vs 20000 input rows
    // the partial->final exchange is the one keyed on g
    val shuffled = nodes.collect {
        case s: ShuffleExchangeExec
          if s.outputPartitioning.toString.contains("g#") => s }
      .flatMap(e => e.metrics.collectFirst {
        case (name, m) if name == "numOutputRows" ||
          name.toLowerCase.contains("records") => m.value
      })
    assert(shuffled.nonEmpty && shuffled.head <= 40L * 16 * k,
      s"shuffle volume not reduced: $shuffled")
    assert(shuffled.head < 20000L, s"shuffled ${shuffled.head} of 20000 rows")
  }

  test("null group keys and null order values match the window plan") {
    val df = spark.range(2000L)
      .select(
        when(col("id") % 5 === 0, lit(null)).otherwise(pmod(col("id"), lit(7L)))
          .as("g"),
        col("id"),
        when(col("id") % 11 === 0, lit(null))
          .otherwise(pmod(col("id") * 31L, lit(997L))).as("score"))
      .repartition(6)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn").collect().map(_.toString).sorted
    val got = TopK.groupTopK(df, Seq("g"), Seq(("score", true), ("id", false)), 4)
      .collect().map(_.toString).sorted
    assert(got.sameElements(expect), "null-handling diverged from window")
  }

  test("±0.0 double group keys form ONE group, like window PARTITION BY") {
    // The optimizer's NormalizeFloatingNumbers rule canonicalizes
    // Aggregate/Window grouping but does not match the custom plan;
    // without explicit normalization the UnsafeRow map key AND the
    // hash exchange split 0.0 vs -0.0 into two groups (r9 review fix).
    val df = spark.range(40L)
      .select(
        // ids 0..19 -> -0.0 (0 * -1.0), ids 20..39 -> 0.0: same SQL
        // group, different IEEE bit patterns
        (when(col("id") < 20, lit(0.0) * lit(-1.0)).otherwise(lit(0.0)))
          .as("g"),
        col("id"))
      .repartition(4)
    val got = TopK.groupTopK(df, Seq("g"), Seq(("id", false)), 3).collect()
    assert(got.length == 3, s"±0.0 split the group: ${got.length} rows")
    assert(got.map(_.getLong(1)).sorted.sameElements(Array(0L, 1L, 2L)),
      got.mkString(","))
  }

  test("group/order names resolve case-insensitively (session default)") {
    val df = spark.range(30L)
      .select(pmod(col("id"), lit(3L)).as("Grp"), col("id").as("Score"))
    val got = TopK.groupTopK(df, Seq("grp"), Seq(("score", true)), 2)
      .collect()
    assert(got.length == 6, got.mkString(","))
  }

  test("gated q176: native result is the exact ROW_NUMBER head") {
    val rows = SparkEntry.queries("q176_group_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= 10))
    // within each source, emitted in (n_chars desc, doc_id) order
    bySource.values.foreach { rs =>
      val pairs = rs.map(r => (-r.getLong(2), r.getLong(1))).toSeq
      assert(pairs == pairs.sorted, "per-source ordering broken")
    }
  }
}
