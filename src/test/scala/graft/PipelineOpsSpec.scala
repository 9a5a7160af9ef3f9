package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextOps}

class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact dedup collapses injected duplicates to one survivor") {
    val res = SparkEntry.queries("q30_exact_dedup")(spark, sf).collect()
    val dups = res.filter(_.getAs[Long]("n_copies") == 2L)
    assert(dups.length == 50, s"expected 50 duplicated docs, got ${dups.length}")
    // survivor is always the original (lower doc_id), never the clone
    assert(dups.forall(_.getAs[Long]("keep_id") < 100000L))
  }

  test("minhash signature: identical docs get identical signatures") {
    val sig = SparkEntry.queries("q31_minhash_signatures")(spark, sf)
    assert(sig.count() > 0)
    // signature values are 32-bit portable hashes
    val row = sig.collect().head
    (0 until 8).foreach { j =>
      val v = row.getAs[Long](s"mh$j")
      assert(v >= 0L && v <= 0xffffffffL)
    }
  }

  test("lsh near-dup candidates are orderable distinct pairs") {
    val pairs = SparkEntry.queries("q32_lsh_near_dup")(spark, sf).collect()
    assert(pairs.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length == pairs.length)
  }

  test("jaccard is within [0,1] and exact for self-similarity shape") {
    val j = SparkEntry.queries("q33_ngram_jaccard")(spark, sf).collect()
    assert(j.forall { r =>
      val v = r.getAs[Double]("jaccard"); v >= 0.0 && v <= 1.0
    })
  }

  test("brute-force cosine top-k is ordered and bounded") {
    val top = SparkEntry.queries("q35_cosine_topk")(spark, sf).collect()
    assert(top.length == 10)
    val cs = top.map(_.getAs[Double]("cos"))
    assert(cs.sameElements(cs.sorted(Ordering[Double].reverse)))
    assert(cs.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("IVF kNN recall: probed-cell top-5 overlaps brute-force top-5") {
    val brute = SparkEntry.queries("q35_cosine_topk")(spark, sf)
      .limit(5).collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = SparkEntry.queries("q36_knn_bucketed")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // nprobe=2 of ~10 cells: expect meaningful overlap, not exactness
    assert(ivf.nonEmpty)
    assert((brute intersect ivf).nonEmpty,
      s"IVF recall is zero: brute=$brute ivf=$ivf")
  }

  test("lang_id emits one prediction per doc from the fixed label set") {
    val res = SparkEntry.queries("q37_lang_id")(spark, sf).collect()
    assert(res.length == 500)
    val langs = Set("en", "de", "es", "fr", "zh")
    assert(res.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("multimodal decodeBatch: per-partition decode keeps schema and count") {
    val media = Multimodal.mediaTable(spark, sf)
    val decoded = Multimodal.decodeBatch(media)
    assert(decoded.schema == Multimodal.decodedSchema)
    val rows = decoded.collect()
    assert(rows.length == media.count().toInt)
    // images/videos got plausible dims; audio got sample counts
    assert(rows.filter(_.getAs[String]("media_type") == "image")
      .forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("n_frames") == 1))
    assert(rows.filter(_.getAs[String]("media_type") == "audio")
      .forall(r => r.getAs[Int]("n_frames") >= 1))
    // deterministic: same payload -> same fake decode
    val again = Multimodal.decodeBatch(media).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("decodeBatch returns TRUE dimensions for real PNG payloads (JDK ImageIO)") {
    // tiny real PNGs rendered in-memory: the image branch is no longer
    // a stub — dimensions must come from the actual payload header
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val dims = Seq((1L, 17, 5), (2L, 3, 29), (3L, 128, 64))
    import spark.implicits._
    val media = dims.map { case (id, w, h) => (id, "image", png(w, h)) }
      .toDF("doc_id", "media_type", "payload")
      .repartition(2) // exercise the per-partition batch path
    val out = Multimodal.decodeBatch(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"))))
      .toMap
    dims.foreach { case (id, w, h) =>
      assert(out(id) == ((w, h, 1)),
        s"doc $id: expected true dims ($w,$h), got ${out(id)}")
    }
    // a non-image byte payload in the image branch falls back to the
    // documented deterministic stub instead of failing the batch
    val junk = Seq((9L, "image", "not a png at all".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "payload")
    val stubbed = Multimodal.decodeBatch(junk).collect().head
    assert(stubbed.getAs[Int]("width") >= 64 && stubbed.getAs[Int]("n_frames") == 1)
  }

  test("decodeBatch parses REAL WAV and MP4 headers (r9: audio/video no longer stubbed)") {
    import spark.implicits._
    // Real WAV: rendered by the JDK's own javax.sound writer — 8000 Hz
    // mono 16-bit PCM, 1600 frames (200 ms).
    def wav(rate: Float, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val data = new Array[Byte](frames * 2)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // Real minimal MP4: hand-built ISO-BMFF boxes — ftyp(isom) +
    // moov{mvhd v0 (timescale 1000, duration 2500ms), trak{tkhd v0
    // (640x360 as 16.16 fixed point), mdia{minf{stbl{stsz (48
    // samples)}}}}}.
    def box(tpe: String, content: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + content.length)
      bb.putInt(8 + content.length).put(tpe.getBytes("ISO-8859-1"))
        .put(content).array()
    }
    def be(i: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(i).array()
    val mvhd = box("mvhd", Array.concat(
      new Array[Byte](12),      // version/flags + ctime + mtime
      be(1000), be(2500),       // timescale, duration
      new Array[Byte](80)))     // rate/volume/matrix/predefines/next-id
    val tkhd = box("tkhd", Array.concat(
      new Array[Byte](76),      // v/f, times, id, dur, layer, matrix...
      be(640 << 16), be(360 << 16)))
    val stsz = box("stsz", Array.concat(
      new Array[Byte](4), be(0), be(48))) // v/f, sample_size=0, count=48
    val trak = box("trak", Array.concat(tkhd,
      box("mdia", box("minf", box("stbl", stsz)))))
    val mp4 = Array.concat(
      box("ftyp", Array.concat("isom".getBytes("ISO-8859-1"), be(0))),
      box("moov", Array.concat(mvhd, trak)))
    // audio-FIRST variant (common muxer order): an audio trak with
    // 0×0 tkhd dims and an 86,016-sample stsz ahead of the video trak
    // — the decoder must skip to the trak with nonzero dims instead of
    // reporting (0, 0, 86016)
    val audioTkhd = box("tkhd", Array.concat(
      new Array[Byte](76), be(0), be(0)))
    val audioStsz = box("stsz", Array.concat(
      new Array[Byte](4), be(0), be(86016)))
    val audioTrak = box("trak", Array.concat(audioTkhd,
      box("mdia", box("minf", box("stbl", audioStsz)))))
    val mp4AudioFirst = Array.concat(
      box("ftyp", Array.concat("isom".getBytes("ISO-8859-1"), be(0))),
      box("moov", Array.concat(mvhd, audioTrak, trak)))

    val media = Seq(
      (1L, "audio", wav(8000f, 1600)),
      (2L, "video", mp4),
      (3L, "audio", "not audio at all".getBytes("UTF-8")), // stub path
      (4L, "video", mp4AudioFirst))
      .toDF("doc_id", "media_type", "payload").repartition(2)
    val rows = Multimodal.decodeBatch(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val a = rows(1L)
    assert(a.getAs[Int]("sample_rate") == 8000, a.toString)
    assert(a.getAs[Int]("n_frames") == 1600, a.toString)
    assert(a.getAs[Long]("duration_ms") == 200L, a.toString)
    assert(a.getAs[String]("codec") == "PCM_SIGNED", a.toString)
    // channel count has its OWN column; width/height stay pixel dims
    // (0 for audio), so `height > 0` means "visual media" downstream
    assert(a.getAs[Int]("channels") == 1, a.toString)
    assert(a.getAs[Int]("width") == 0 && a.getAs[Int]("height") == 0,
      a.toString)
    val v = rows(2L)
    assert(v.getAs[Int]("width") == 640 && v.getAs[Int]("height") == 360,
      v.toString)
    assert(v.getAs[Long]("duration_ms") == 2500L, v.toString)
    assert(v.getAs[Int]("n_frames") == 48, v.toString)
    assert(v.getAs[String]("codec") == "isom", v.toString)
    // undecodable audio falls back to the deterministic stub
    assert(rows(3L).getAs[String]("codec") == "stub", rows(3L).toString)
    assert(rows(3L).getAs[Int]("n_frames") >= 1)
    // audio-first MP4: dims and frame count come from the VIDEO trak
    val af = rows(4L)
    assert(af.getAs[Int]("width") == 640 && af.getAs[Int]("height") == 360,
      af.toString)
    assert(af.getAs[Int]("n_frames") == 48, af.toString)
  }

  test("malformed image payloads fall back instead of failing the job (NonFatal contract)") {
    // Payloads with a VALID format signature but corrupt innards — the
    // class where ImageIO readers are known to throw RuntimeExceptions
    // (IllegalArgument / ArrayIndexOutOfBounds / NegativeArraySize) on
    // some JDKs, not just IOException. The contract: one bad payload
    // must never kill a billion-image pass — decodeBatch falls back to
    // the stub row, extractPatches yields no rows for it.
    def pngTruncated: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      java.util.Arrays.copyOf(bos.toByteArray, 20) // cut mid-IHDR
    }
    def bmpGarbage: Array[Byte] = {
      val b = Array.fill[Byte](64)(0xEE.toByte); b(0) = 'B'; b(1) = 'M'; b
    }
    def gifBadLzw: Array[Byte] = {
      val g = new java.io.ByteArrayOutputStream()
      g.write("GIF89a".getBytes("ASCII"))
      g.write(Array[Byte](4, 0, 4, 0, 0x80.toByte, 0, 0))
      g.write(Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte))
      g.write(0x2C)
      g.write(Array[Byte](0, 0, 0, 0, 4, 0, 4, 0, 0))
      g.write(12) // invalid LZW minimum code size (>11)
      g.write(Array[Byte](2, 0x99.toByte, 0x00)); g.write(0); g.write(0x3B)
      g.toByteArray
    }
    def tiffBigCount: Array[Byte] = {
      val t = new java.io.ByteArrayOutputStream()
      t.write(Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0, 1, 0))
      // ImageWidth tag with count Int.MaxValue — allocation-bomb class
      t.write(Array[Byte](0, 1, 3, 0, 0xFF.toByte, 0xFF.toByte,
        0xFF.toByte, 0x7F, 12, 0, 0, 0))
      t.write(Array[Byte](0, 0, 0, 0))
      t.toByteArray
    }
    import spark.implicits._
    val bad = Seq((1L, pngTruncated), (2L, bmpGarbage), (3L, gifBadLzw),
      (4L, tiffBigCount))
    val media = bad.map { case (id, p) => (id, "image", p) }
      .toDF("doc_id", "media_type", "payload").repartition(2)
    // decodeBatch: every payload yields a row (stub or header-derived),
    // and nothing throws
    val decoded = Multimodal.decodeBatch(media).collect()
    assert(decoded.length == bad.length)
    assert(decoded.forall(_.getAs[Int]("n_bytes") > 0))
    // extractPatches: unreadable rasters contribute zero rows, job lives
    assert(Multimodal.extractPatches(media, patchSize = 8).count() == 0L)
  }

  test("extractPatches: real RGB patches from real PNGs; grid matches the q104 budget") {
    import spark.implicits._
    // 16x16 PNG, one solid color per 8x8 quadrant -> with patchSize=8
    // each patch must be uniformly its quadrant's color
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0x808080)
    def quadPng(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, colors((y / 8) * 2 + (x / 8)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 30x20 PNG -> patchSize=8 gives a 4x3 grid with cropped edges
    def widePng(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        30, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", quadPng()), (2L, "image", widePng()),
      (3L, "image", "junk bytes".getBytes("UTF-8")), // undecodable: no rows
      (4L, "audio", quadPng())) // wrong modality: filtered
      .toDF("doc_id", "media_type", "payload")
      .repartition(2)
    val got = Multimodal.extractPatches(media, patchSize = 8).collect()

    val quad = got.filter(_.getAs[Long]("doc_id") == 1L)
    assert(quad.length == 4)
    quad.foreach { p =>
      val expected = colors(p.getAs[Int]("patch_row") * 2 + p.getAs[Int]("patch_col"))
      val px = p.getAs[Array[Byte]]("pixels")
      assert(px.length == 8 * 8 * 3)
      px.grouped(3).foreach { rgb =>
        val v = ((rgb(0) & 0xff) << 16) | ((rgb(1) & 0xff) << 8) | (rgb(2) & 0xff)
        assert(v == expected,
          s"patch (${p.getAs[Int]("patch_row")},${p.getAs[Int]("patch_col")}): " +
            f"pixel $v%06x != $expected%06x")
      }
    }
    // q104's budget: ceil(30/8) x ceil(20/8) = 4 x 3, edges cropped
    val wide = got.filter(_.getAs[Long]("doc_id") == 2L)
    assert(wide.length == 12)
    assert(wide.filter(p => p.getAs[Int]("patch_col") == 3)
      .forall(_.getAs[Int]("patch_w") == 6))
    assert(wide.filter(p => p.getAs[Int]("patch_row") == 2)
      .forall(_.getAs[Int]("patch_h") == 4))
    assert(!got.exists(p => p.getAs[Long]("doc_id") >= 3L),
      "undecodable/non-image payloads must yield no patch rows")
  }

  test("extractPatches resizes into the box with q75's integer plan") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((7L, "image", bos.toByteArray))
      .toDF("doc_id", "media_type", "payload")
    // box=16: 64x32 -> tw = 64*16/64 = 16, th = 32*16/64 = 8 -> one
    // full 8x8 patch plus one 8x8 at col 1 (16/8=2 cols, 1 row)
    val got = Multimodal.extractPatches(media, patchSize = 8, box = 16)
      .collect()
    assert(got.length == 2)
    assert(got.forall(p => p.getAs[Int]("patch_w") == 8 &&
      p.getAs[Int]("patch_h") == 8))
  }

  test("repetition signals: degenerate doc flagged, clean doc passes") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "w x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = TextOps.repetitionSignals(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val rep = r(1L)
    assert(rep.getAs[Long]("n_tok") == 4L)
    assert(rep.getAs[Double]("distinct_ratio") == 0.25)
    assert(rep.getAs[Long]("adj_repeats") == 3L)
    // 3 bigrams, 1 distinct ("a a") -> dup fraction 2/3
    assert(rep.getAs[Double]("dup_2gram_ratio") == 0.666667)
    val clean = r(2L)
    assert(clean.getAs[Double]("distinct_ratio") == 1.0)
    assert(clean.getAs[Double]("dup_2gram_ratio") == 0.0)
    assert(clean.getAs[Long]("adj_repeats") == 0L)
    // single-token doc: empty gram arrays, zero ratios, no errors
    val solo = r(3L)
    assert(solo.getAs[Long]("n_tok") == 1L)
    assert(solo.getAs[Double]("dup_2gram_ratio") == 0.0)
    assert(solo.getAs[Double]("dup_3gram_ratio") == 0.0)
  }

  test("sequence packing: exact greedy boundaries and token conservation") {
    import spark.implicits._
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, "en", txt(4)), (1L, "en", txt(4)), (2L, "en", txt(4)),
      (3L, "en", txt(5)), (4L, "en", txt(1))).toDF("doc_id", "lang", "text")
    val packed = TextOps.packSequences(docs, budget = 10, shards = 1)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    // cum_before: 0,4,8,12,17 -> floor(/10): 0,0,0,1,1
    assert(packed == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // on real data: per-stream pack_ids contiguous from 0, tokens conserved
    val out = SparkEntry.queries("q67_sequence_pack")(spark, sf).collect()
    val streams = out.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
    streams.foreach { case (k, rows) =>
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L && ids.sameElements(0L until ids.length),
        s"non-contiguous packs in $k: ${ids.toSeq}")
      // every non-final pack crosses its budget boundary
      val ordered = rows.sortBy(_.getAs[Long]("pack_id"))
      var cum = 0L
      ordered.init.foreach { r =>
        cum += r.getAs[Long]("pack_tokens")
        assert(cum >= (r.getAs[Long]("pack_id") + 1) * 2048,
          s"pack ${r.getAs[Long]("pack_id")} in $k under-filled")
      }
    }
  }

  test("pii scrub: injected PII is counted and fully redacted") {
    val res = SparkEntry.queries("q68_pii_scrub")(spark, sf).collect()
    val (hit, clean) = res.partition(_.getAs[Long]("doc_id") % 7 == 0)
    // every injected footer yields exactly one email, one IP, one phone
    assert(hit.nonEmpty)
    assert(hit.forall(r => r.getAs[Long]("n_emails") == 1L
      && r.getAs[Long]("n_ips") == 1L && r.getAs[Long]("n_phones") == 1L))
    assert(clean.forall(r => r.getAs[Long]("n_emails") == 0L
      && r.getAs[Long]("n_ips") == 0L && r.getAs[Long]("n_phones") == 0L))
    // redaction is complete: re-scrubbing the cleaned text finds nothing
    val docs = GraftSession.table(spark, sf, "documents")
    val once = TextOps.piiScrub(docs.withColumn("text",
      concat(col("text"), lit(" a@b.co 10.0.0.1 call +1-555-123-4567"))))
      .select(col("doc_id"), col("clean").as("text"))
    val twice = TextOps.piiScrub(once)
    assert(twice.filter(col("n_emails") > 0 || col("n_ips") > 0
      || col("n_phones") > 0).count() == 0L)
  }

  test("contamination screen only flags docs that share a benchmark gram") {
    val flagged = SparkEntry.queries("q69_contamination")(spark, sf).collect()
    assert(flagged.nonEmpty)
    // no benchmark doc flags itself, and every hit count is positive
    assert(flagged.forall(_.getAs[Long]("doc_id") % 97 != 0))
    assert(flagged.forall(_.getAs[Long]("n_bench_grams") > 0))
    // spot-check one flagged doc truly shares a 3-gram with the bench set
    val docs = GraftSession.table(spark, sf, "documents")
    val sh = graft.operators.Dedup.shingles(docs)
    val benchGrams = sh.filter(col("doc_id") % 97 === 0)
      .select("sh").distinct()
    val id = flagged.head.getAs[Long]("doc_id")
    val shared = sh.filter(col("doc_id") === id)
      .join(benchGrams, "sh").count()
    assert(shared > 0, s"doc $id flagged but shares no gram")
  }

  test("int8 quantization: codes bounded and reconstruction error tight") {
    val q = SparkEntry.queries("q70_embedding_quantize")(spark, sf).collect()
    assert(q.forall(_.getAs[Long]("max_abs_code") <= 127L))
    // absmax scaling: per-dim error <= scale/(2*127) + fp slop, so the
    // per-vector L1 error is bounded by n_dims * amax / 254
    assert(q.forall { r =>
      r.getAs[Double]("recon_err") <=
        r.getAs[Long]("n_dims") * r.getAs[Double]("amax") / 254.0 + 1e-6
    })
  }

  test("domain mix: kept counts track the uniform target mixture") {
    val mix = SparkEntry.queries("q71_domain_mix")(spark, sf).collect()
    val docs = GraftSession.table(spark, sf, "documents")
    val total = docs.count().toDouble
    val target = total / mix.length
    mix.foreach { r =>
      val kept = r.getAs[Long]("n_kept").toDouble
      // hash-threshold sampling: expect the per-source target within
      // generous binomial slack at sf0.001 sizes
      assert(kept <= target * 1.5 + 10,
        s"${r.getAs[String]("source")} kept $kept, target $target")
    }
  }

  test("quality filter: keep iff no reject flag fires, and both classes exist") {
    val rows = SparkEntry.queries("q73_quality_filter")(spark, sf).collect()
    assert(rows.forall { r =>
      val flags = Seq("r_short", "r_punct", "r_repeat", "r_dup2")
        .map(r.getAs[Int](_)).sum
      r.getAs[Int]("keep") == (if (flags == 0) 1 else 0)
    })
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    assert(kept > 0 && kept < rows.length,
      s"degenerate filter: kept $kept of ${rows.length}")
  }

  test("stratified sample is deterministic and tracks per-stratum rates") {
    val a = SparkEntry.queries("q66_stratified_sample")(spark, sf).collect()
    val b = SparkEntry.queries("q66_stratified_sample")(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val totals = GraftSession.table(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong)
    kept.foreach { case (lang, n) =>
      val rate = n.toDouble / totals(lang)
      val want = if (lang == "en") 0.25 else 0.125
      assert(math.abs(rate - want) < 0.15,
        s"$lang sampled at $rate, wanted ~$want of ${totals(lang)}")
    }
  }

  test("chunk windows: stride starts, window cap, full coverage, exact tail") {
    import spark.implicits._
    // 100-token doc -> starts 0,48,96: lens 64,52,4; 40-token doc -> one
    // short chunk; 1-token doc -> one 1-token chunk
    val docs = Seq(
      (1L, (0 until 100).map(i => s"t$i").mkString(" ")),
      (2L, (0 until 40).map(i => s"u$i").mkString(" ")),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val rows = graft.operators.TextOps.chunkWindows(docs)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 52L), (1L, 2L, 96L, 4L),
      (2L, 0L, 0L, 40L),
      (3L, 0L, 0L, 1L)))
    // coverage: with stride <= window every token index lands in a chunk
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4)).toSet
      val n = cs.map(c => c._3 + c._4).max
      assert(covered === (0L until n).toSet)
    }
  }
}
