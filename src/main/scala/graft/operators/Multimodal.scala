package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession.table

/** Pack C (multimodal) — opaque-binary column plumbing
  * (SURVEY.md §2.C12): media payloads travel as `binary` columns with
  * typed metadata beside them; decoding happens batch-wise per
  * partition. All three branches now decode REAL headers (r9):
  * IMAGE via the JDK's `javax.imageio` (PNG/GIF/BMP/JPEG), AUDIO via
  * the JDK's `javax.sound.sampled` (WAV/RIFF, AIFF, AU — sample rate,
  * channel count, frame count, encoding tag, all from the header),
  * VIDEO via a hand-parsed ISO-BMFF/MP4 box walk (ftyp brand, mvhd
  * duration/timescale, tkhd display dims, stsz frame count — pure
  * big-endian arithmetic, no codec lib needed for header metadata).
  * Payloads none of those can read fall back to a deterministic
  * disclosed stub, so the Spark-side plumbing — schema, partitioning,
  * per-partition batch shape — is exercised for real either way.
  *
  * Scale notes: payload bytes never shuffle (metadata extraction is a
  * narrow map); decode batches amortize per-partition setup exactly
  * the way an Arrow/pandas-UDF batch would on a real cluster, and the
  * decoded-feature schema is fixed so downstream ops stay columnar.
  * Every header parse reads a bounded prefix of the payload — no
  * full-raster/full-stream allocation on the metadata pass.
  */
object Multimodal {

  /** Typed result of the decoder (real header fields where the branch
    * can parse them; zeros/"stub" from the fallback). */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** Real image decode via the JDK's built-in readers
    * (`javax.imageio`): true width/height for PNG/GIF/BMP/JPEG
    * payloads. `ImageReader` off an in-memory stream reads only the
    * HEADER to answer dimensions — no pixel raster is allocated, so a
    * metadata pass over billions of images stays cheap. None = the
    * bytes are not a JDK-readable image (falls back to the stub). */
  private[graft] def decodeImage(payload: Array[Byte]): Option[(Int, Int)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      // NonFatal, not just IOException: JDK ImageIO readers throw
      // RuntimeExceptions (IllegalArgument, ArrayIndexOutOfBounds,
      // NegativeArraySize) on malformed/truncated payloads, and one
      // bad payload must not fail a billion-image metadata pass —
      // undecodable bytes fall back to the stub, per the contract.
      case scala.util.control.NonFatal(_) => None
    }

  /** Real audio header decode via the JDK's `javax.sound.sampled`
    * (the audio analogue of the ImageIO path): WAV/RIFF, AIFF and AU
    * headers answer (sampleRate, channels, frameCount, encoding)
    * without decoding any samples. None = not a JDK-readable audio
    * header (falls back to the stub). */
  private[graft] def decodeAudio(payload: Array[Byte])
      : Option[(Int, Int, Long, String)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      Some((fmt.getSampleRate.toInt, fmt.getChannels, math.max(0L, frames),
        fmt.getEncoding.toString))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Big-endian u32 read. */
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Iterate ISO-BMFF boxes in [from, to): (type, contentStart,
    * contentEnd). Handles 64-bit largesize (size==1) and to-end
    * (size==0) boxes; malformed sizes end the walk. */
  private def mp4Boxes(b: Array[Byte], lo: Int, hi: Int)
      : Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var off = lo
    override def hasNext: Boolean = off + 8 <= hi
    override def next(): (String, Int, Int) = {
      val size = be32(b, off)
      val tpe = new String(b, off + 4, 4, "ISO-8859-1")
      val (cs, boxEnd) =
        if (size == 1L && off + 16 <= hi) {
          val large = (be32(b, off + 8) << 32) | be32(b, off + 12)
          (off + 16, math.min(hi.toLong, off + large).toInt)
        } else if (size == 0L) (off + 8, hi)
        else (off + 8, math.min(hi.toLong, off + size).toInt)
      // malformed (size < header): emit to end-of-range, then stop
      val end = if (boxEnd <= off + 8) hi else boxEnd
      off = end
      (tpe, cs, end)
    }
  }

  private def findMp4Box(b: Array[Byte], lo: Int, hi: Int,
      path: List[String]): Option[(Int, Int)] = path match {
    case Nil => Some((lo, hi))
    case head :: rest =>
      mp4Boxes(b, lo, hi).collectFirst {
        case (t, cs, ce) if t == head => (cs, ce)
      }.flatMap { case (cs, ce) => findMp4Box(b, cs, ce, rest) }
  }

  /** Real ISO-BMFF/MP4 header decode, pure box arithmetic: major
    * brand (codec tag) from `ftyp`, duration from `moov/mvhd`
    * (duration/timescale, version 0 and 1), display dims from
    * `moov/trak/tkhd` (16.16 fixed point), frame count from the
    * sample-size table `moov/trak/mdia/minf/stbl/stsz`. None = not an
    * MP4 (no ftyp) or no parsable moov. */
  private[graft] def decodeMp4(payload: Array[Byte])
      : Option[(Int, Int, Int, Long, String)] =
    try {
      if (payload.length < 16 ||
        new String(payload, 4, 4, "ISO-8859-1") != "ftyp") None
      else {
        val brand = new String(payload, 8, 4, "ISO-8859-1").trim
        findMp4Box(payload, 0, payload.length, List("moov")).map {
          case (ms, me) =>
            val durationMs = findMp4Box(payload, ms, me, List("mvhd"))
              .map { case (cs, _) =>
                val v = payload(cs) & 0xff
                if (v == 1) {
                  val scale = be32(payload, cs + 20)
                  val dur = (be32(payload, cs + 24) << 32) |
                    be32(payload, cs + 28)
                  if (scale > 0) dur * 1000L / scale else 0L
                } else {
                  val scale = be32(payload, cs + 12)
                  val dur = be32(payload, cs + 16)
                  if (scale > 0) dur * 1000L / scale else 0L
                }
              }.getOrElse(0L)
            // Pick the VIDEO trak, not the first trak: common muxer
            // output orders [audio, video], and the audio tkhd has
            // 0×0 dims while its stsz holds the audio SAMPLE count —
            // first-trak reads would report (0, 0, ~86k) for a 2 s
            // clip. A trak with nonzero tkhd dims is the video track;
            // dims and frame count must come from the SAME trak.
            val traks = mp4Boxes(payload, ms, me)
              .collect { case ("trak", cs, ce) => (cs, ce) }.toList
            def tkhdDims(tr: (Int, Int)): (Int, Int) =
              findMp4Box(payload, tr._1, tr._2, List("tkhd"))
                .map { case (cs, _) =>
                  val v = payload(cs) & 0xff
                  val base = if (v == 1) cs + 88 else cs + 76
                  ((be32(payload, base) >> 16).toInt,
                    (be32(payload, base + 4) >> 16).toInt)
                }.getOrElse((0, 0))
            val trak = traks.find { t =>
              val (tw, th) = tkhdDims(t); tw > 0 && th > 0
            }.orElse(traks.headOption)
            val (w, h) = trak.map(tkhdDims).getOrElse((0, 0))
            val nFrames = trak.flatMap(t => findMp4Box(payload, t._1,
              t._2, List("mdia", "minf", "stbl", "stsz")))
              .map { case (cs, _) => be32(payload, cs + 8).toInt }
              .getOrElse(0)
            (w, h, nFrames, durationMs, brand)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder for payloads no JDK/header parser can read. The
    * fake is a pure function of the payload bytes, so tests are
    * deterministic and the batch plumbing is exercised for real. */
  private def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload) & 0x7fffffff
    mediaType match {
      case "image" => (64 + h % 1856, 64 + (h / 1856) % 1016, 1)
      case "audio" => (0, 0, 1 + h % 48000)          // samples
      case _       => (64 + h % 1856, 64 + (h / 1856) % 1016, 1 + h % 240)
    }
  }

  /** Batch decode: one decoder instance per partition (mapPartitions),
    * payloads never leave their partition. All branches parse REAL
    * headers (ImageIO / javax.sound / MP4 box walk); undecodable
    * bytes fall back to the disclosed stub with codec = "stub". */
  def decodeBatch(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media_type"), col("payload"))
      .rdd.mapPartitions { rows =>
        // per-partition decoder setup would go here (codec contexts etc.)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val mt = r.getAs[String]("media_type")
          // (w, h, frames, sampleRate, channels, durationMs, codec) —
          // width/height are PIXEL dims only (0 for audio); the audio
          // channel count has its own column rather than being smuggled
          // into height, so `height > 0` cleanly means "visual media".
          val real: Option[(Int, Int, Int, Int, Int, Long, String)] = mt match {
            case "image" => decodeImage(payload).map { case (iw, ih) =>
              (iw, ih, 1, 0, 0, 0L, "image") }
            case "audio" => decodeAudio(payload).map {
              case (rate, ch, frames, enc) =>
                val durMs = if (rate > 0) frames * 1000L / rate else 0L
                // a >2^31-frame stream (~13.5 h of 44.1 kHz audio) must
                // saturate, not wrap negative; duration_ms stays exact
                (0, 0, math.min(frames, Int.MaxValue.toLong).toInt,
                  rate, ch, durMs, enc) }
            case _ => decodeMp4(payload).map {
              case (w, h, nf, durMs, brand) => (w, h, nf, 0, 0, durMs, brand) }
          }
          val (w, hgt, frames, rate, ch, durMs, codec) = real.getOrElse {
            val (sw, sh, sf) = decodeStub(mt, payload)
            (sw, sh, sf, 0, 0, 0L, "stub")
          }
          // null payload (missing blob) must be a stub row, not an NPE
          // killing the pass — the decode branches already survive it
          // via their NonFatal catches (r9 review fix)
          val nBytes = if (payload == null) 0 else payload.length
          Row(r.getAs[Long]("doc_id"), mt, nBytes, w, hgt, frames,
            rate, ch, durMs, codec)
        }
      }
    spark.createDataFrame(out, decodedSchema)
  }

  private val patchSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("patch_row", IntegerType),
    StructField("patch_col", IntegerType),
    StructField("patch_w", IntegerType),
    StructField("patch_h", IntegerType),
    StructField("pixels", org.apache.spark.sql.types.BinaryType)))

  /** REAL ViT input prep for image payloads: decode (JDK ImageIO, full
    * raster this time), resize into the `box` bounding square with
    * q75's exact integer plan (aspect preserved, no upscaling), and
    * emit row-major `patchSize`² RGB patches — (doc_id, patch_row,
    * patch_col, patch_w, patch_h, pixels) with `pixels` =
    * patch_w·patch_h·3 bytes. Edge patches are cropped, so the grid is
    * exactly q104's ceil(tw/p)·ceil(th/p) budget. Payloads ImageIO
    * cannot read yield no rows (the metadata pass q41 is where
    * undecodables get accounted).
    *
    * Scale shape: payload bytes never shuffle — decode, resize and
    * patching happen inside the scan partition (mapPartitions, the
    * same batch path as [[decodeBatch]]); only the patch rows (the
    * actual training input) leave the partition. One decoded raster
    * is live per row at a time, so executor memory is bounded by the
    * largest single image, not the batch. */
  def extractPatches(media: DataFrame, patchSize: Int = 16,
      box: Int = 512): DataFrame = {
    require(patchSize > 0 && box > 0)
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media_type"), col("payload"))
      .where(col("media_type") === "image")
      .rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            // NonFatal (see decodeImage): corrupt payloads yield no
            // rows instead of killing the job
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Iterator.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            val longSide = math.max(w, h)
            val (tw, th) =
              if (longSide <= box) (w, h)
              else (math.max(1, w * box / longSide),
                math.max(1, h * box / longSide))
            val scaled =
              if (tw == w && th == h) img
              else {
                val o = new java.awt.image.BufferedImage(tw, th,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = o.createGraphics()
                g.drawImage(img, 0, 0, tw, th, null)
                g.dispose()
                o
              }
            val docId = r.getAs[Long]("doc_id")
            val ny = (th + patchSize - 1) / patchSize
            val nx = (tw + patchSize - 1) / patchSize
            for {
              pr <- Iterator.range(0, ny)
              pc <- Iterator.range(0, nx)
            } yield {
              val pw = math.min(patchSize, tw - pc * patchSize)
              val ph = math.min(patchSize, th - pr * patchSize)
              val bytes = new Array[Byte](pw * ph * 3)
              var y = 0
              while (y < ph) {
                var x = 0
                while (x < pw) {
                  val rgb = scaled.getRGB(pc * patchSize + x, pr * patchSize + y)
                  val i = (y * pw + x) * 3
                  bytes(i) = ((rgb >> 16) & 0xff).toByte
                  bytes(i + 1) = ((rgb >> 8) & 0xff).toByte
                  bytes(i + 2) = (rgb & 0xff).toByte
                  x += 1
                }
                y += 1
              }
              Row(docId, pr, pc, pw, ph, bytes)
            }
          }
        }
      }
    spark.createDataFrame(out, patchSchema)
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
      val h = graft.GraftSession.portableHash(col("text"))
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
    }),

    "q74_frame_sample" -> ((s, dir) => {
      // Frame sampling plumbing for video payloads: frame count comes
      // from the (portable) decoded metadata, the sample is every 30th
      // frame as (doc_id, frame_idx, frame_ts) rows. explode(sequence)
      // is the Spark shape: the payload column is NOT carried through
      // the explode — at 100 TB only the tiny frame index fans out, and
      // the actual pixel fetch joins back by doc_id inside the decode
      // batch. Timestamps are exact 24fps rationals rounded to 6.
      val h = graft.GraftSession.portableHash(col("text"))
      table(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the 'video' rows
        .withColumn("n_frames", pmod(h, lit(240)) + 1)
        .withColumn("frame_idx",
          explode(sequence(lit(0L), col("n_frames") - 1, lit(30L))))
        .withColumn("frame_ts", round(col("frame_idx") / 24.0, 6))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          col("frame_ts"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    "q104_patch_grid" -> ((s, dir) => {
      // ViT patch-grid planning on top of the q75 resize plan: a
      // vision-language pipeline budgets VISUAL TOKENS per image =
      // ceil(tw/16)·ceil(th/16) — needed before batch packing the same
      // way q67 packs text tokens. Integer arithmetic only
      // ((x+15) div 16), exact cross-engine; builds on q75's df the
      // way q76 builds on q14.
      queries("q75_resize_plan")(s, dir)
        .withColumn("px", expr("(tw + 15) div 16"))
        .withColumn("py", expr("(th + 15) div 16"))
        .withColumn("n_visual_tokens", col("px") * col("py"))
        .select(col("doc_id"), col("tw"), col("th"),
          col("px"), col("py"), col("n_visual_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q75_resize_plan" -> ((s, dir) => {
      // Resize planning: fit each image into a 512-box preserving
      // aspect ratio, integer arithmetic only (the pixel work is the
      // stubbed decode; the PLAN — target dims per payload — is what
      // the pipeline schedules and is exact cross-engine). Upscaling
      // is clamped: media already inside the box keeps its dims.
      val h = graft.GraftSession.portableHash(col("text"))
      table(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the 'image' rows
        .withColumn("h", h)
        .withColumn("w", pmod(col("h"), lit(1920)) + 1)
        .withColumn("ht", pmod(expr("h div 1920"), lit(1080)) + 1)
        .withColumn("long_side", greatest(col("w"), col("ht")))
        .withColumn("tw", when(col("long_side") <= 512, col("w"))
          .otherwise(expr("w * 512 div long_side")))
        .withColumn("th", when(col("long_side") <= 512, col("ht"))
          .otherwise(expr("ht * 512 div long_side")))
        .select(col("doc_id"), col("w"), col("ht"), col("tw"), col("th"))
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
        |FROM m ORDER BY doc_id""".stripMargin,

    "q74_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    ('0x'||substr(md5(text),1,8))::BIGINT % 240 + 1 AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, n_frames,
        |    UNNEST(generate_series(0, n_frames - 1, 30)) AS frame_idx
        |  FROM v)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        | CAST(frame_idx AS BIGINT) AS frame_idx,
        | ROUND(CAST(frame_idx AS DOUBLE) / CAST(24 AS DOUBLE), 6) AS frame_ts
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q104_patch_grid" ->
      """WITH m AS (
        |  SELECT doc_id, ('0x'||substr(md5(text),1,8))::BIGINT AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |d AS (
        |  SELECT doc_id, h % 1920 + 1 AS w, (h // 1920) % 1080 + 1 AS ht,
        |    GREATEST(h % 1920 + 1, (h // 1920) % 1080 + 1) AS long_side
        |  FROM m),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN long_side <= 512 THEN w
        |      ELSE w * 512 // long_side END AS tw,
        |    CASE WHEN long_side <= 512 THEN ht
        |      ELSE ht * 512 // long_side END AS th
        |  FROM d)
        |SELECT doc_id, CAST(tw AS BIGINT) AS tw, CAST(th AS BIGINT) AS th,
        | CAST((tw + 15) // 16 AS BIGINT) AS px,
        | CAST((th + 15) // 16 AS BIGINT) AS py,
        | CAST(((tw + 15) // 16) * ((th + 15) // 16) AS BIGINT)
        |   AS n_visual_tokens
        |FROM r ORDER BY doc_id""".stripMargin,

    "q75_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id, ('0x'||substr(md5(text),1,8))::BIGINT AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |d AS (
        |  SELECT doc_id, h % 1920 + 1 AS w, (h // 1920) % 1080 + 1 AS ht,
        |    GREATEST(h % 1920 + 1, (h // 1920) % 1080 + 1) AS long_side
        |  FROM m)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(ht AS BIGINT) AS ht,
        | CAST(CASE WHEN long_side <= 512 THEN w
        |   ELSE w * 512 // long_side END AS BIGINT) AS tw,
        | CAST(CASE WHEN long_side <= 512 THEN ht
        |   ELSE ht * 512 // long_side END AS BIGINT) AS th
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
