package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.GraftConnection

class GraftConnectionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mkRecords(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (s"evt-${i % 3}", s"key-${i % 7}", s"""{"i":$i}""",
        new java.sql.Timestamp(1700000000000L + i * 1000L))
    }.toDF("event", "key", "message", "ts")
  }

  test("prepareTopic refuses a cached topic with a different partition count") {
    val conn = graft.log.GraftConnection.connect(spark,
      Files.createTempDirectory("connp").toString)
    conn.prepareTopic("orders", 4)
    assert(conn.prepareTopic("orders", 4).numPartitions == 4)
    intercept[IllegalArgumentException] {
      conn.prepareTopic("orders", 16)
    }
  }

  test("prepareTopic is idempotent create-or-get per connection") {
    val root = Files.createTempDirectory("conn").toString
    val conn = GraftConnection.connect(spark, root)
    val t1 = conn.prepareTopic("orders")
    val t2 = conn.prepareTopic("orders")
    assert(t1 eq t2)
    val other = conn.prepareTopic("shipments")
    assert(!(t1 eq other))
    t1.publish(mkRecords(20))
    assert(conn.prepareTopic("orders").read().count() == 20)
    assert(conn.prepareTopic("shipments").read().count() == 0)
  }

  test("prepareTopic on an unusable root fails with a clear error (reference: create fails if not connected)") {
    // kafkaish test/topic.js: 'fails with error if not connected'.
    // graft's connect() is the storage root: a root that cannot hold
    // topic directories (a plain file occupies the path) must throw at
    // prepare time, not corrupt silently at first publish.
    val f = Files.createTempFile("not-a-dir", ".tmp")
    val conn = GraftConnection.connect(spark, f.toString)
    intercept[Exception] {
      conn.prepareTopic("orders").publish(mkRecords(1))
    }
  }

  test("close() drops cached handles; prepareTopic after close returns a fresh topic (reference: recreate when closed)") {
    // connection.js:42-55 re-creates a topic whose cached instance is
    // closed; graft's close() clears the cache so the next prepare
    // builds a fresh handle over the same durable log.
    val root = Files.createTempDirectory("conn").toString
    val conn = GraftConnection.connect(spark, root)
    val t1 = conn.prepareTopic("orders")
    t1.publish(mkRecords(5))
    conn.close()
    val t2 = conn.prepareTopic("orders")
    assert(!(t1 eq t2), "close() must not keep serving the old instance")
    assert(t2.read().count() == 5, "the durable log survives close()")
  }

  test("replay scan prunes log partitions (PartitionFilters on log_part)") {
    val root = Files.createTempDirectory("conn").toString
    val conn = GraftConnection.connect(spark, root)
    val topic = conn.prepareTopic("t", numPartitions = 4)
    topic.publish(mkRecords(100))
    val somePart = topic.heads().keys.head
    val onePart = topic.read().filter(col("log_part") === somePart)
    val plan = onePart.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(log_part"), plan)
    assert(onePart.count() > 0)
  }
}
