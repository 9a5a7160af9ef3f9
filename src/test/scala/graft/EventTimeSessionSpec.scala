package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.log.TopicLog
import graft.streaming.TopicStream

class EventTimeSessionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("event-time timeout flushes a quiet key once the watermark passes") {
    val dir = Files.createTempDirectory("stream").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 2)
    val sess = TopicStream.sessionize(spark,
      TopicStream.subscribe(topic, fromNow = false),
      gapMs = 10 * 60 * 1000L, eventTimeFlush = true, watermark = "5 minutes")
    val q = sess.writeStream.format("memory").queryName("etsess")
      .outputMode("append").start()
    try {
      import spark.implicits._
      val t0 = 1700000000000L
      // burst for k1, then (later batch) far-future events for k2 that
      // push the watermark past k1's gap -> k1's session must flush via
      // timeout even though k1 never gets another event.
      topic.publish((0 until 4).map(i =>
        ("e", "k1", "{}", new java.sql.Timestamp(t0 + i * 60000L)))
        .toDF("event", "key", "message", "ts"))
      q.processAllAvailable()
      topic.publish((0 until 2).map(i =>
        ("e", "k2", "{}", new java.sql.Timestamp(t0 + 3 * 60 * 60 * 1000L + i * 1000L)))
        .toDF("event", "key", "message", "ts"))
      q.processAllAvailable()
      // one more batch so the new watermark is applied to timeouts
      topic.publish(Seq(("e", "k2", "{}",
        new java.sql.Timestamp(t0 + 3 * 60 * 60 * 1000L + 60000L)))
        .toDF("event", "key", "message", "ts"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM etsess WHERE key = 'k1'").collect()
      assert(rows.length == 1, s"expected k1 session flushed by watermark, got ${rows.length}")
      assert(rows.head.getAs[Int]("nEvents") == 4)
    } finally q.stop()
  }

  test("batch session_window agrees with q27's gap-based sessions") {
    import org.apache.spark.sql.functions._
    // Spark's declarative session_window (gap >= 30 min closes, micro
    // precision) vs q27's lag-based rule (gap > 1800 s, second
    // precision): boundary semantics differ only at EXACT 30-minute
    // gaps, which this corpus doesn't contain — so session counts and
    // size multisets must line up, cross-validating both encodings.
    val ev = GraftSession.eventsTable(spark, sf)
    def perUser(sessions: org.apache.spark.sql.DataFrame) = sessions
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sort_array(collect_list(col("n_events"))).as("sizes"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Long](2))).toMap
    val declarative = perUser(ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events")))
    val gapBased = perUser(SparkEntry.queries("q27_sessionize")(spark, sf))
    assert(declarative === gapBased)
  }
}
