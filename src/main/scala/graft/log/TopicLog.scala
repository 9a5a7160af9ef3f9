package graft.log

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native re-expression of the reference's durable topic
  * (kafkaish `src/topic.js`): an append-only, partitioned log with
  * monotonic per-partition offsets, named durable subscribers with
  * acked watermarks, replay-from-offset, head lookup, compaction and
  * retention.
  *
  * Mapping from the reference (cited file:line):
  *  - topic = capped collection            -> partitioned parquet log dir
  *    (`topic.js:266-296` create)             `<path>/log/log_part=N/`
  *  - `_id` monotonic ObjectId             -> `offset` long, monotonic per
  *                                            `log_part` (Kafka-style)
  *  - publish (`topic.js:26-41`)           -> [[publish]] batch append
  *  - ack upsert (`topic.js:198-223`)      -> [[ack]] subscriber watermark
  *  - replay from last ack                 -> [[replay]] offset-predicate
  *    (`topic.js:142-197` replayFrom)         scan, pushed to parquet
  *  - latest() head (`topic.js:224-250`)   -> [[latest]]
  *  - capped-size retention (`topic.js:8`) -> [[retainFrom]] trim by offset
  *  - (Kafka analogue, not in reference)   -> [[compact]] latest-per-key
  *
  * Scale design: offsets need no global coordination — each log_part
  * numbers independently (base = current per-partition head, read from
  * a head aggregate that is O(partitions) via parquet column stats, not
  * O(log)). Appends are new files only; compaction/retention rewrite a
  * partition at a time. Replay is `offset > watermark` + event filter,
  * both pushed into the parquet scan, so a subscriber reading the tail
  * of a 100 TB topic scans only the tail row groups.
  */
final class TopicLog(val spark: SparkSession, val path: String, val numPartitions: Int = 8) {

  private val logDir = s"$path/log"
  private val subsDir = s"$path/subscribers"
  new java.io.File(logDir).mkdirs() // prepareTopic creates the topic infra

  /** Current per-partition head offsets (−1 when empty). O(partitions)
    * work: min/max come from parquet footer stats, no data scan. */
  def heads(): Map[Int, Long] =
    read().groupBy(col("log_part")).agg(max(col("offset")).as("head"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Publish a batch of records: columns (event, key, message, ts).
    * Assigns log_part = pmod(hash(key)) and per-partition monotonic
    * offsets continuing from the current heads. The whole batch is
    * appended atomically-enough for a single writer (new files only). */
  def publish(records: DataFrame): Unit = {
    val base = heads()
    val baseDf = spark.createDataFrame(
      java.util.Arrays.asList(
        (0 until numPartitions).map(p =>
          org.apache.spark.sql.Row(p, base.getOrElse(p, -1L))): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("log_part", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("base_offset", org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy(col("log_part"))
      .orderBy(col("ts"), col("event"), col("key"), col("message"))
    records
      .withColumn("log_part",
        pmod(hash(coalesce(col("key"), col("message"))), lit(numPartitions)).cast("int"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .join(broadcast(baseDf), Seq("log_part"))
      .withColumn("offset", col("base_offset") + col("seq"))
      .select(col("offset"), col("ts"), col("event"), col("key"),
        col("message"), col("log_part"))
      .write.mode(SaveMode.Append).partitionBy("log_part").parquet(logDir)
  }

  /** The full log as a DataFrame (partition-pruned reads downstream).
    * Explicit schema so empty (just-prepared) topics read as 0 rows. */
  def read(): DataFrame =
    spark.read.schema(TopicLog.SCHEMA).parquet(logDir)

  /** Typed view of the log for callers that want compile-time field
    * checks on record handling. */
  def readTyped(): org.apache.spark.sql.Dataset[TopicRecord] = {
    implicit val enc: org.apache.spark.sql.Encoder[TopicRecord] =
      org.apache.spark.sql.Encoders.product[TopicRecord]
    read().select(col("offset"), col("ts"), col("event"), col("key"),
      col("message"), col("log_part")).as[TopicRecord]
  }

  /** Head offset info, the reference's `latest()` (topic.js:224-250). */
  def latest(): DataFrame =
    read().groupBy(col("log_part"))
      .agg(max(col("offset")).as("head_offset"), count(lit(1)).as("n_records"))

  /** Durable subscriber watermarks (name, log_part, last_offset). */
  def subscribers(): DataFrame =
    if (new java.io.File(subsDir).exists()) spark.read.parquet(subsDir)
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("log_part", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("last_offset", org.apache.spark.sql.types.LongType))))

  /** Upsert a subscriber's acked watermark (reference `ack`,
    * topic.js:198-223): last-write-wins per (name, log_part). */
  def ack(name: String, watermarks: Map[Int, Long]): Unit = {
    val rows = watermarks.toSeq.map { case (p, o) =>
      org.apache.spark.sql.Row(name, p, o)
    }
    val newDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      subscribers().schema)
    val merged = subscribers()
      .filter(!(col("name") === name && col("log_part").isin(watermarks.keys.toSeq: _*)))
      .union(newDf)
    stageSwap(merged.coalesce(1), subsDir, partitioned = false)
  }

  /** Rewrite a directory we are also reading from: write to a staging
    * dir, then atomically swap. Never materializes data on the driver. */
  private def stageSwap(df: DataFrame, dir: String, partitioned: Boolean): Unit = {
    val tmp = s"$dir.staging"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitioned) writer.partitionBy("log_part") else writer).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), target)
  }

  /** Replay for a durable subscriber (reference `replay`/`replayFrom`,
    * topic.js:118-197): records strictly after the acked watermark of
    * `name`, optionally filtered to one event type (null = all, matching
    * topic.js:169-171). New subscribers replay from the beginning. */
  def replay(name: String, event: Option[String] = None): DataFrame = {
    val marks = subscribers().filter(col("name") === name)
      .select(col("log_part"), col("last_offset"))
    val base = read()
      .join(broadcast(marks), Seq("log_part"), "left")
      .filter(col("last_offset").isNull || col("offset") > col("last_offset"))
      .drop("last_offset")
    event.fold(base)(e => base.filter(col("event") === e))
      .orderBy(col("log_part"), col("offset"))
  }

  /** Kafka-style log compaction: keep only the latest record per key
    * (per partition). Rewrites the log in place. */
  def compact(): Unit = {
    val w = Window.partitionBy(col("log_part"), col("key"))
      .orderBy(col("offset").desc)
    val compacted = read()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    stageSwap(compacted, logDir, partitioned = true)
  }

  /** Time-based retention: drop records older than `minTs` (the
    * wall-clock face of the capped collection, topic.js:8-10). At
    * cluster scale the log would also be date-partitioned so this is a
    * partition drop, not a rewrite. */
  def retainAfter(minTs: java.sql.Timestamp): Unit =
    stageSwap(read().filter(col("ts") >= lit(minTs)), logDir, partitioned = true)

  /** Retention trim (the reference's capped-collection analogue,
    * topic.js:8-10): drop records at or below the given per-partition
    * offset watermarks. */
  def retainFrom(minOffsets: Map[Int, Long]): Unit = {
    val trimmed = minOffsets.map { case (p, o) =>
      col("log_part") === p && col("offset") >= o
    }.reduceOption(_ || _).getOrElse(lit(false))
    val untouched =
      if (minOffsets.isEmpty) lit(true)
      else !col("log_part").isin(minOffsets.keys.toSeq: _*)
    stageSwap(read().filter(untouched || trimmed), logDir, partitioned = true)
  }
}

/** One record of a topic log (typed face of TopicLog.SCHEMA). */
case class TopicRecord(
    offset: Long,
    ts: java.sql.Timestamp,
    event: String,
    key: String,
    message: String,
    log_part: Int)

object TopicLog {
  import org.apache.spark.sql.types._

  /** Canonical log record schema (SURVEY.md §3). `log_part` is the
    * physical partition directory column — it must come LAST: the
    * streaming file source emits rows as dataSchema ++ partitionSchema,
    * and a user schema in any other order silently misaligns columns. */
  val SCHEMA: StructType = StructType(Seq(
    StructField("offset", LongType),
    StructField("ts", TimestampType),
    StructField("event", StringType),
    StructField("key", StringType),
    StructField("message", StringType),
    StructField("log_part", IntegerType)))

  /** prepareTopic (reference connection.js:40-56). */
  def prepare(spark: SparkSession, path: String, numPartitions: Int = 8): TopicLog =
    new TopicLog(spark, path, numPartitions)
}
