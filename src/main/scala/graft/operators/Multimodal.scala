package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession.table

/** Pack C (multimodal) — opaque-binary column plumbing
  * (SURVEY.md §2.C12): media payloads travel as `binary` columns with
  * typed metadata beside them; decoding happens batch-wise per
  * partition. The decode itself is STUBBED (no image/audio libs in
  * this container) with a deterministic fake, but the Spark-side
  * plumbing — schema, partitioning, per-partition batch shape — is
  * real and spec-tested.
  *
  * Scale notes: payload bytes never shuffle (metadata extraction is a
  * narrow map); decode batches amortize per-partition setup exactly
  * the way an Arrow/pandas-UDF batch would on a real cluster, and the
  * decoded-feature schema is fixed so downstream ops stay columnar.
  */
object Multimodal {

  /** Typed result of the (stubbed) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** STUB decoder: in production this would call an image/audio codec
    * on each payload (the libs are absent here). The fake is a pure
    * function of the payload bytes, so tests are deterministic and the
    * batch plumbing is exercised for real. */
  private def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload) & 0x7fffffff
    mediaType match {
      case "image" => (64 + h % 1856, 64 + (h / 1856) % 1016, 1)
      case "audio" => (0, 0, 1 + h % 48000)          // samples
      case _       => (64 + h % 1856, 64 + (h / 1856) % 1016, 1 + h % 240)
    }
  }

  /** Batch decode: one decoder instance per partition (mapPartitions),
    * payloads never leave their partition. */
  def decodeBatch(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media_type"), col("payload"))
      .rdd.mapPartitions { rows =>
        // per-partition decoder setup would go here (codec contexts etc.)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val mt = r.getAs[String]("media_type")
          val (w, hgt, frames) = decodeStub(mt, payload)
          Row(r.getAs[Long]("doc_id"), mt, payload.length, w, hgt, frames)
        }
      }
    spark.createDataFrame(out, decodedSchema)
  }

  /** documents reinterpreted as a media table: text bytes stand in for
    * the opaque payload (deterministic, schema-faithful). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_meta" -> ((s, dir) => {
      // Metadata extraction over opaque binary payloads: byte length,
      // content hash, media tag, fake decoded dims — all scan-side.
      val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      table(s, dir, "documents")
        .withColumn("media_type",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
        .withColumn("n_bytes", octet_length(col("text")).cast("long"))
        .withColumn("content_hash", md5(col("text")))
        .withColumn("h", h)
        .withColumn("meta_width", pmod(col("h"), lit(1920)))
        .withColumn("meta_height", pmod(expr("h div 1920"), lit(1080)))
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("content_hash"), col("meta_width"), col("meta_height"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q41_multimodal_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    md5(text) AS content_hash,
        |    ('0x'||substr(md5(text),1,8))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, media_type, n_bytes, content_hash,
        | h % 1920 AS meta_width, (h // 1920) % 1080 AS meta_height
        |FROM m ORDER BY doc_id""".stripMargin
  )
}
