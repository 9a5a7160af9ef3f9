package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.TopicLog

class TopicLogSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mkRecords(n: Int, startId: Int = 0) = {
    import spark.implicits._
    (startId until startId + n).map { i =>
      (s"evt-${i % 3}", s"key-${i % 5}", s"""{"i":$i}""",
        new java.sql.Timestamp(1700000000000L + i * 1000L))
    }.toDF("event", "key", "message", "ts")
  }

  test("publish assigns monotonic per-partition offsets across batches") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 4)
    topic.publish(mkRecords(50))
    val h1 = topic.heads()
    topic.publish(mkRecords(50, startId = 50))
    val h2 = topic.heads()
    assert(h1.nonEmpty && h2.nonEmpty)
    h1.foreach { case (p, h) => assert(h2(p) > h, s"head of part $p did not advance") }
    // offsets are dense per partition: max-min+1 == count
    val byPart = topic.read().groupBy(col("log_part"))
      .agg(min("offset").as("lo"), max("offset").as("hi"), count(lit(1)).as("n"))
      .collect()
    byPart.foreach { r =>
      assert(r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1 == r.getAs[Long]("n"))
      assert(r.getAs[Long]("lo") == 0L)
    }
    assert(topic.read().count() == 100)
  }

  test("replay: new subscriber sees everything, acked subscriber only the tail") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 4)
    topic.publish(mkRecords(60))
    // new durable subscriber replays from the beginning (topic.js:132-135)
    assert(topic.replay("sub1").count() == 60)
    // event filter during replay (topic.js:169-171)
    val filtered = topic.replay("sub1", Some("evt-0")).collect()
    assert(filtered.nonEmpty && filtered.forall(_.getAs[String]("event") == "evt-0"))
    // ack everything seen so far, then replay drains nothing
    topic.ack("sub1", topic.heads())
    assert(topic.replay("sub1").count() == 0)
    // more messages arrive; only those replay
    topic.publish(mkRecords(15, startId = 60))
    assert(topic.replay("sub1").count() == 15)
    // an unrelated subscriber still replays everything
    assert(topic.replay("sub2").count() == 75)
  }

  test("partial ack replays from the per-partition watermark") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 2)
    topic.publish(mkRecords(40))
    val heads = topic.heads()
    // ack only half of each partition
    topic.ack("s", heads.map { case (p, h) => p -> h / 2 })
    val replayed = topic.replay("s").collect()
    replayed.groupBy(_.getAs[Int]("log_part")).foreach { case (p, rows) =>
      assert(rows.forall(_.getAs[Long]("offset") > heads(p) / 2))
    }
    assert(replayed.length ==
      heads.map { case (p, h) => h - h / 2 }.sum)
  }

  test("compact keeps only the latest record per key") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 4)
    topic.publish(mkRecords(100)) // 5 keys, 20 records each
    topic.compact()
    val left = topic.read().collect()
    assert(left.length == 5, s"expected 5 keys, got ${left.length}")
    // the survivor per key is the max-offset record
    assert(topic.replay("fresh").count() == 5)
  }

  test("typed read: Dataset[TopicRecord] round-trips the log") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 2)
    topic.publish(mkRecords(10))
    val ds = topic.readTyped()
    val recs = ds.collect()
    assert(recs.length == 10)
    assert(recs.forall(r => r.event.startsWith("evt-") && r.offset >= 0))
    // typed transformations compile and behave
    assert(ds.filter(_.event == "evt-0").count() ==
      topic.read().filter(col("event") === "evt-0").count())
  }

  test("time-based retention drops records older than the cutoff") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 2)
    topic.publish(mkRecords(40)) // ts = base + i*1000ms
    val cutoff = new java.sql.Timestamp(1700000000000L + 20 * 1000L)
    topic.retainAfter(cutoff)
    val left = topic.read().collect()
    assert(left.length == 20, s"expected 20 surviving records, got ${left.length}")
    assert(left.forall(!_.getAs[java.sql.Timestamp]("ts").before(cutoff)))
  }

  test("retention trims below the watermark, like a capped collection") {
    val dir = Files.createTempDirectory("topic").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 2)
    topic.publish(mkRecords(40))
    val heads = topic.heads()
    topic.retainFrom(heads.map { case (p, h) => p -> h }) // keep only heads
    assert(topic.read().count() == heads.size)
    // offsets keep their identity after the trim (no renumbering)
    val offs = topic.read().select("log_part", "offset").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(offs == heads)
  }
}
