package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy-hitters aggregate: the deterministic MG bounds
  * (est <= true, est >= true - n/(capacity+1), every item above the
  * threshold present) must hold against exact counts under every
  * partition layout, and with capacity above the distinct count the
  * sketch is exact.
  */
class FreqTopKAggSpec extends AnyFunSuite {
  import SparkTestSession._

  // zipf-ish corpus: item i appears ~N/i times for i in 1..40, as longs
  private def corpus(parts: Int) = {
    val rows = (1 to 40).flatMap(i => Seq.fill(2000 / i)(i.toLong))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Tuple1(_)), parts)
    ).toDF("item")
  }

  private def sketch(parts: Int, capacity: Int): Map[Long, Long] =
    corpus(parts)
      .agg(expr(s"freq_topk_agg(item, $capacity)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val exact: Map[Long, Long] =
    corpus(4).groupBy(col("item")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val n: Long = exact.values.sum

  test("MG bounds hold under single and multi-partition merges") {
    for (parts <- Seq(1, 4, 16); capacity <- Seq(8, 16)) {
      val est = sketch(parts, capacity)
      val slack = n / (capacity + 1)
      est.foreach { case (item, c) =>
        val t = exact(item)
        assert(c <= t, s"over-count item=$item est=$c true=$t [$parts/$capacity]")
        assert(c >= t - slack,
          s"under-count beyond bound: item=$item est=$c true=$t slack=$slack [$parts/$capacity]")
      }
      // every true heavy hitter must be present
      exact.filter(_._2 > slack).keys.foreach { item =>
        assert(est.contains(item),
          s"heavy hitter $item (true=${exact(item)} > $slack) missing [$parts/$capacity]")
      }
    }
  }

  test("capacity above the distinct count makes the sketch exact") {
    for (parts <- Seq(1, 8)) {
      assert(sketch(parts, 64) === exact, s"parts=$parts")
    }
  }

  test("string items work and q102 emits a stable 10-row top list") {
    import spark.implicits._
    val words = Seq.fill(500)("the") ++ Seq.fill(300)("of") ++
      (1 to 200).map(i => s"rare$i")
    val est = words.toDF("w")
      .agg(expr("freq_topk_agg(w, 16)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.contains("the") && est.contains("of"))
    assert(est("the") <= 500 && est("the") >= 500 - 1000 / 17)
    val q102 = SparkEntry.queries("q102_heavy_hitters")(spark, sf).collect()
    assert(q102.length === 10)
    val counts = q102.map(_.getAs[Long]("est_count"))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)))
  }
}
