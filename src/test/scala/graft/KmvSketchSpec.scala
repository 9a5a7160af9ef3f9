package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct sketch: merge-order INDEPENDENCE (identical sketch
  * arrays under every partition layout — stronger than bounded error),
  * exactness below k, distinct-estimate accuracy at ~1/√(k−2) RSE, and
  * intersection estimates incl. the disjoint and identical edges.
  */
class KmvSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def longs(n: Int, parts: Int, offset: Long = 0L) =
    spark.createDataFrame(
      spark.sparkContext.parallelize((1 to n).map(i => Tuple1(i + offset)), parts)
    ).toDF("v")

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    df.agg(expr(s"kmv_sketch_agg(v, $k)").as("sk"))
      .collect().head.getSeq[Long](0).toList

  test("the sketch is identical under every partition layout (merge-order independent)") {
    val k = 256
    val s1 = sketchOf(longs(20000, 1), k)
    val s4 = sketchOf(longs(20000, 4), k)
    val s32 = sketchOf(longs(20000, 32), k)
    assert(s1.length == k)
    assert(s1 == s4 && s4 == s32,
      "k smallest hashes must not depend on partitioning")
  }

  test("below k the sketch is the exact hash set; estimate == exact count") {
    val est = longs(100, 3)
      .agg(expr("kmv_estimate(kmv_sketch_agg(v, 256), 256)").as("e"))
      .collect().head.getDouble(0)
    assert(est === 100.0)
  }

  test("distinct estimate lands within 5 RSE of exact") {
    val k = 1024
    val n = 50000
    val est = longs(n, 8)
      .agg(expr(s"kmv_estimate(kmv_sketch_agg(v, $k), $k)").as("e"))
      .collect().head.getDouble(0)
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n) <= 5 * rse * n,
      s"est $est vs exact $n (bound ${5 * rse * n})")
  }

  test("intersection: disjoint ~ 0, identical ~ n, half-overlap within bounds") {
    val k = 1024
    def pairEst(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double = {
      val sa = a.agg(expr(s"kmv_sketch_agg(v, $k)").as("ska"))
      val sb = b.agg(expr(s"kmv_sketch_agg(v, $k)").as("skb"))
      sa.crossJoin(sb)
        .select(expr(s"kmv_intersect_estimate(ska, skb, $k)").as("i"))
        .collect().head.getDouble(0)
    }
    val n = 20000
    assert(pairEst(longs(n, 4), longs(n, 4, offset = 1000000L)) === 0.0)
    val same = pairEst(longs(n, 4), longs(n, 2))
    assert(math.abs(same - n) <= 5.0 * n / math.sqrt(k), s"identical: $same")
    // A = 1..20000, B = 10001..30000 -> overlap 10000, union 30000
    val half = pairEst(longs(n, 4), longs(n, 4, offset = 10000L))
    assert(math.abs(half - 10000.0) <= 5.0 * 30000.0 / math.sqrt(k),
      s"half-overlap: $half")
  }

  test("kmv_union_agg rolls up persisted daily sketches to the global sketch exactly") {
    // the hll_union_agg pattern: per-day sketches re-aggregate to the
    // union's sketch — which must BYTE-EQUAL the sketch built directly
    // over the full stream (union of KMV sketches is itself the exact
    // KMV sketch of the united hash set)
    val k = 256
    val events = spark.range(60000).select(
      (col("id") % 5).as("day"), ((col("id") * 7919L) % 40000L).as("v"))
    val daily = events.groupBy(col("day"))
      .agg(expr(s"kmv_sketch_agg(v, $k)").as("sk"))
    val rolled = daily.agg(expr(s"kmv_union_agg(sk, $k)").as("sk"))
      .collect().head.getSeq[Long](0).toList
    val direct = events.agg(expr(s"kmv_sketch_agg(v, $k)").as("sk"))
      .collect().head.getSeq[Long](0).toList
    assert(rolled == direct, "rolled-up union sketch diverged from direct")
    // and the rolled sketch feeds the estimator like any other
    val est = daily.agg(
        expr(s"kmv_estimate(kmv_union_agg(sk, $k), $k)").as("e"))
      .collect().head.getDouble(0)
    val exact = events.select(col("v")).distinct().count()
    assert(math.abs(est - exact) <= 5.0 * exact / math.sqrt(k - 2.0))
  }

  test("kmv_sketch_agg runs in a watermarked streaming window (live distinct estimates)") {
    // The streaming face: per-window distinct-user sketches at k longs
    // of state per window — TypedImperativeAggregate buffers serialize
    // through the state store, so the same aggregate serves batch and
    // live. Parity: the streamed per-window sketches must equal the
    // batch sketches over the same data (merge-order independence
    // makes this byte-equality, not just bounded error).
    val dir = java.nio.file.Files.createTempDirectory("kmv-stream").toString
    val events = spark.range(30000).select(
      org.apache.spark.sql.functions.timestamp_micros(
        lit(1700000000000000L) + (col("id") % 4) * 3600L * 1000000L).as("ts"),
      (col("id") % 7000).as("user"))
    events.coalesce(2).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(events.schema))
      .parquet(s"$dir/in")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("kmv_sketch_agg(user, 256)").as("sk"))
    val q = stream.writeStream.format("memory").queryName("kmvw")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT window.start AS s, sk FROM kmvw")
        .collect().map(r => r.getTimestamp(0) -> r.getSeq[Long](1).toList).toMap
      val batch = events.groupBy(window(col("ts"), "1 hour"))
        .agg(expr("kmv_sketch_agg(user, 256)").as("sk"))
        .select(col("window.start").as("s"), col("sk"))
        .collect().map(r => r.getTimestamp(0) -> r.getSeq[Long](1).toList).toMap
      assert(streamed.size == 4)
      assert(streamed == batch, "streamed sketches diverged from batch")
    } finally q.stop()
  }

  test("q115 gate query: every segment pair within bounds, none filtered") {
    val ev = GraftSession.eventsTable(spark, sf)
    val nTypes = ev.select(col("event_type")).distinct().count()
    val rows = SparkEntry.queries("q115_segment_overlap")(spark, sf).collect()
    assert(rows.length == (nTypes * (nTypes - 1)) / 2,
      s"a pair fell out of the bounds filter: ${rows.length} of " +
        s"${nTypes * (nTypes - 1) / 2}")
    rows.foreach(r => assert(r.getAs[Boolean]("within_bounds")))
  }
}
