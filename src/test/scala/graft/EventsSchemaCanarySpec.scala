package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary for `GraftSession.eventsTable`.
  *
  * The driver has shipped events.parquet with `ts` as BOTH a
  * TIMESTAMP(NANOS) bigint (read as long under `nanosAsLong`) and a
  * plain timestamp[us]; round 7 lost 34 gated queries because the
  * loader assumed one of them. This spec writes BOTH fixtures itself
  * and asserts eventsTable normalizes each to identical TimestampType
  * micros — so an input-schema change breaks in-repo, not at the gate.
  */
class EventsSchemaCanarySpec extends AnyFunSuite {
  import SparkTestSession._

  private val wallClockMicros = 1704067200123456L // 2024-01-01 00:00:00.123456 UTC

  private def writeFixture(tsCol: org.apache.spark.sql.Column, tag: String): String = {
    val dir = Files.createTempDirectory(s"events-canary-$tag").toString
    spark.range(1)
      .select(
        lit(1L).as("event_id"),
        tsCol.as("ts"),
        lit(7L).as("user_id"),
        lit("click").as("event_type"),
        lit(1.5).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedTs(dir: String): (DataType, Timestamp) = {
    val df = GraftSession.eventsTable(spark, dir)
    val dt = df.schema("ts").dataType
    val v = df.select(col("ts")).collect().head.getTimestamp(0)
    (dt, v)
  }

  test("eventsTable normalizes a nanos-long ts parquet to micros TimestampType") {
    val dir = writeFixture(lit(wallClockMicros * 1000L).cast(LongType), "long")
    val (dt, v) = loadedTs(dir)
    assert(dt == TimestampType)
    assert(v.getTime == wallClockMicros / 1000L)
    assert(v.getNanos == (wallClockMicros % 1000000L).toInt * 1000)
  }

  test("eventsTable normalizes a timestamp[us] ts parquet to the same micros") {
    val dir = writeFixture(
      timestamp_micros(lit(wallClockMicros)).cast(TimestampNTZType), "ntz")
    val (dt, v) = loadedTs(dir)
    assert(dt == TimestampType)
    assert(v.getTime == wallClockMicros / 1000L)
    assert(v.getNanos == (wallClockMicros % 1000000L).toInt * 1000)
  }

  test("eventsTable also accepts an instant-typed (TIMESTAMP) ts parquet") {
    val dir = writeFixture(timestamp_micros(lit(wallClockMicros)), "tz")
    val (dt, v) = loadedTs(dir)
    assert(dt == TimestampType)
    assert(v.getTime == wallClockMicros / 1000L)
  }

  test("driver testdata events table loads with TimestampType ts and rows") {
    val df = GraftSession.eventsTable(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
