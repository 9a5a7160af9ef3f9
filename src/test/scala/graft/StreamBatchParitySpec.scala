package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The unification claim: the same declarative aggregation produces
  * identical results whether the events table is read as a batch or
  * replayed through a Structured Streaming query.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming tumbling-window agg equals the batch q25 result") {
    val batch = SparkEntry.queries("q25_tumbling_window")(spark, sf)
      .collect().map(_.toString).sorted

    // file stream source wants a directory; link the table into one
    val srcDir = java.nio.file.Files.createTempDirectory("sbp").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(srcDir, "events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val evSchema = GraftSession.table(spark, sf, "events").schema
    val raw = spark.readStream
      .schema(evSchema)
      .parquet(srcDir)
      .withColumn("ts", GraftSession.eventsTsNorm(evSchema))
    val agg = raw
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("sbp")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT hour, event_type, n_events, sum_value FROM sbp")
        .collect().map(_.toString).sorted
      assert(streamed.length == batch.length)
      assert(streamed.sameElements(batch),
        s"stream/batch divergence: ${streamed.take(2).mkString} vs ${batch.take(2).mkString}")
    } finally q.stop()
  }

  test("streaming content dedup keeps exactly one survivor per distinct content (batch q30 contract)") {
    // clone every 10th doc (the q30 corpus shape), stream it through
    // dedupByContent: the kept CONTENT set must equal the batch
    // distinct-content set, with exactly one survivor each (streaming
    // keeps first-arrival where batch keeps min doc_id — same
    // contents either way).
    val docs = GraftSession.table(spark, sf, "documents")
    val withDups = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 500000L))
    val srcDir = java.nio.file.Files.createTempDirectory("sbp3").toString
    withDups.withColumn("ts", timestamp_micros(lit(1700000000000000L)))
      .coalesce(1).write.parquet(s"$srcDir/in")
    val batchContents = withDups.select(md5(col("text"))).distinct().count()

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        withDups.withColumn("ts", timestamp_micros(lit(0L))).schema))
      .parquet(s"$srcDir/in")
    val deduped = graft.streaming.TopicStream
      .dedupByContent(stream, contentCol = "text")
      .select(col("doc_id"), md5(col("text")).as("content"))
    val q = deduped.writeStream.format("memory").queryName("sbp3")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id, content FROM sbp3").collect()
      assert(kept.length.toLong === batchContents,
        s"expected one survivor per content: ${kept.length} vs $batchContents")
      assert(kept.map(_.getString(1)).distinct.length === kept.length)
    } finally q.stop()
  }

  test("pipeline ops run unchanged on the streaming path (quality filter + pii)") {
    // Stateless scan-side operators (quality gates, PII scrub) must
    // compose with a streaming source exactly as with a batch scan —
    // that's what makes the batch pipeline reusable as a live filter
    // in front of a topic.
    val docs = GraftSession.table(spark, sf, "documents")
    val batch = graft.operators.TextOps.qualityFilter(docs)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    val srcDir = java.nio.file.Files.createTempDirectory("sbp2").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(srcDir, "documents.parquet"),
      java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    val filtered = graft.operators.TextOps.qualityFilter(stream)
      .select(col("doc_id"), col("keep"))
    val q = filtered.writeStream.format("memory").queryName("sbp2")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, keep FROM sbp2").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batch, "streaming quality filter diverged from batch")
    } finally q.stop()
  }

  test("streaming inter-arrival monitor equals batch q151, batch-boundary-invariant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = GraftSession.eventsTable(spark, sf)
    val batch = graft.operators.EventOps.interarrivalRegularity(ev)
      .collect()
      .map(r => r.getAs[Long]("user_id").toString ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("mean_gap_s"),
          r.getAs[Double]("cv"), r.getAs[Boolean]("regular"))))
      .toMap
    assert(batch.nonEmpty, "need users with >= 20 events at this sf")

    val rows = ev.select(col("user_id").cast("string").as("key"), col("ts"))
      .orderBy(col("ts"), col("event_id"))
      .as[(String, java.sql.Timestamp)].collect().toSeq

    def run(slices: Seq[Seq[(String, java.sql.Timestamp)]], name: String) = {
      val ms = MemoryStream[(String, java.sql.Timestamp)]
      val out = graft.streaming.TopicStream.interarrivalMonitor(
        spark, ms.toDF().toDF("key", "ts"))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        slices.foreach { s => ms.addData(s); q.processAllAvailable() }
        spark.sql(s"SELECT * FROM $name").collect()
          .map(r => r.getAs[String]("key") ->
            ((r.getAs[Long]("nEvents"), r.getAs[Double]("meanGapS"),
              r.getAs[Double]("cv"), r.getAs[Boolean]("regular"))))
          .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }
      } finally q.stop()
    }
    def normalize(m: Map[String, (Long, Double, Double, Boolean)]) =
      m.collect { case (k, (n, mean, cv, reg)) if n >= 20 =>
        k -> ((n, math.rint(mean * 1e6) / 1e6, math.rint(cv * 1e6) / 1e6, reg))
      }

    val oneBatch = normalize(run(Seq(rows), "iam1").toMap)
    val threeBatches = normalize(
      run(rows.grouped((rows.length + 2) / 3).toSeq, "iam3").toMap)
    assert(oneBatch == threeBatches, "batch-boundary variance detected")
    assert(oneBatch == batch.map { case (k, (n, mean, cv, reg)) =>
      k -> ((n, mean, cv, reg)) },
      s"stream/batch divergence: ${oneBatch.take(2)} vs ${batch.take(2)}")
  }

  test("inter-arrival monitor drops late cross-batch events instead of corrupting cv") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // Perfectly regular 10s cadence for key "u"...
    val inOrder = (1 to 30).map(i => ("u", ts(i * 10L)))
    def run(slices: Seq[Seq[(String, java.sql.Timestamp)]], name: String) = {
      val ms = MemoryStream[(String, java.sql.Timestamp)]
      val out = graft.streaming.TopicStream.interarrivalMonitor(
        spark, ms.toDF().toDF("key", "ts"))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        slices.foreach { s => ms.addData(s); q.processAllAvailable() }
        spark.sql(s"SELECT * FROM $name").collect()
          .map(r => (r.getAs[Long]("nEvents"), r.getAs[Double]("cv"),
            r.getAs[Boolean]("regular")))
          .maxBy(_._1)
      } finally q.stop()
    }
    val clean = run(Seq(inOrder), "iamLate1")
    // ...then one LATE straggler (t=5s, far below state.last=300s) in a
    // second micro-batch. Pre-guard this folded gap=-295 into sg/sg2
    // and flipped the key to irregular forever; now it must be dropped:
    // same event count, same cv, still regular.
    val withLate = run(Seq(inOrder, Seq(("u", ts(5L)))), "iamLate2")
    assert(clean._3, s"precondition: clean cadence should be regular: $clean")
    assert(withLate == clean,
      s"late event corrupted monitor state: $withLate vs $clean")
  }
}
