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
}
