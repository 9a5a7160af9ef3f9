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
}
