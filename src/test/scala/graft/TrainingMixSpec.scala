package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Dedup, Sampling}

/** The round-8 training-data additions: BPE tokenizer training
  * (q132/q133), shingle novelty (q134), k-means parity (q135),
  * temperature mixing (q136), and DSIR importance weights (q137).
  */
class TrainingMixSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- BPE -----------------------------------------------------------

  test("bpe pair counts are word-frequency weighted") {
    val docs = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val pc = Bpe.pairCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc == Map("ab" -> 3L, "cd" -> 1L))
  }

  test("bpe merge fold never over-merges overlapping occurrences") {
    // "aaab": pairs (a,a) twice + (a,b) once per word — merge 1 is
    // (a,a). Left-to-right the word becomes [aa, a, b]: the second
    // (a,a) occurrence overlaps the first and must NOT merge.
    val docs = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val m = Bpe.bpeMerges(docs, 1).collect()
    assert(m.length == 1)
    assert((m(0).getString(1), m(0).getString(2), m(0).getString(3))
      == ("a", "a", "aa"))
    assert(m(0).getAs[Long]("cnt") == 6L) // 2 occurrences x freq 3
  }

  test("bpe merges compose: second round merges against merged symbols") {
    // 10x "the" + 2x "cat": round 1 ties (h,e)=(t,h)=10, broken on
    // byte order -> (h,e); round 2 must see ["t","he"] and merge
    // (t,he) -> "the".
    val docs = Seq((1L, (Seq.fill(10)("the") ++ Seq("cat", "cat"))
      .mkString(" "))).toDF("doc_id", "text")
    val m = Bpe.bpeMerges(docs, 2).collect().sortBy(_.getLong(0))
    assert(m(0).getString(3) == "he" && m(0).getAs[Long]("cnt") == 10L)
    assert(m(1).getString(3) == "the" && m(1).getAs[Long]("cnt") == 10L)
  }

  test("gated bpe queries return rows at sf0.001") {
    assert(SparkEntry.queries("q132_bpe_pair_counts")(spark, sf).count() == 50)
    val merges = SparkEntry.queries("q133_bpe_merges")(spark, sf).collect()
    assert(merges.length == 6)
    // each merge rule's merged symbol is exactly left||right
    merges.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }

  test("bpe encode: learned merges compress; bounds hold per doc") {
    // "the" merges fully in 2 rounds -> 10 words x 1 token; "cat"
    // keeps 3 single-char symbols (its pairs never win a round)
    val docs = Seq((1L, (Seq.fill(10)("the") ++ Seq("cat", "cat"))
      .mkString(" "))).toDF("doc_id", "text")
    val e = Bpe.bpeEncode(docs, 2).collect().head
    assert(e.getAs[Long]("n_words") == 12L)
    assert(e.getAs[Long]("n_chars_tok") == 36L)
    assert(e.getAs[Long]("n_bpe_tokens") == 10L * 1 + 2L * 3)
    val all = SparkEntry.queries("q140_bpe_encode")(spark, sf).collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") <= r.getAs[Long]("n_chars_tok"))
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("bpe fertility: fragmented script shows higher tokens-per-word") {
    // lang A dominates training -> its word merges; lang B's word
    // never wins a merge and stays at chars/word fertility
    val docs = Seq(
      (1L, Seq.fill(20)("the").mkString(" "), "A"),
      (2L, "xyzq xyzq", "B")).toDF("doc_id", "text", "lang")
    val f = Bpe.bpeFertility(docs, 2).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("fertility")).toMap
    assert(f("A") == 1.0)   // "the" fully merged in 2 rounds
    assert(f("B") == 4.0,   // "xyzq" untouched: 4 single-char symbols
      s"expected fragmented lang at chars/word, got ${f("B")}")
  }

  // ---- shingle novelty ----------------------------------------------

  test("novelty: cloned docs score 0, unique docs score 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // clone of 1
      (3L, "epsilon zeta eta theta iota")).toDF("doc_id", "text")
    val nov = Dedup.shingleNovelty(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nov == Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
  }

  // ---- k-means -------------------------------------------------------

  test("kmeans iteration: every vector assigned, cluster ids from the seed set") {
    val res = SparkEntry.queries("q135_kmeans_iter")(spark, sf).collect()
    val total = res.map(_.getAs[Long]("n")).sum
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(total == nVec, s"assignments $total != corpus $nVec")
    assert(res.forall(r => r.getAs[Long]("cl") >= 0 && r.getAs[Long]("cl") < 8))
    assert(res.forall(r => math.abs(r.getAs[Double]("avg_cos")) <= 1.0))
  }

  test("semdedup: an exact duplicate embedding is dropped, originals kept") {
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(8)(rnd.nextFloat())
    val base = (0L to 8L).map(i => (i, vec()))
    val emb = (base :+ ((9L, base(8)._2))) // vec 9 duplicates vec 8
      .toDF("vec_id", "embedding")
    val res = graft.operators.Similarity
      .semDedup(emb, k = 8, threshold = 0.999).collect()
    assert(res.map(_.getAs[Long]("n_members")).sum == 10L)
    assert(res.map(_.getAs[Long]("n_dropped")).sum == 1L)
  }

  // ---- temperature mixing -------------------------------------------

  test("mixture weights: alpha<1 up-weights the small domain, p sums to ~1") {
    val docs = (
      (0 until 9).map(i => (i.toLong, Seq.fill(100)("w").mkString(" "), "big")) :+
        (9L, Seq.fill(100)("w").mkString(" "), "small"))
      .toDF("doc_id", "text", "source")
    val mw = Sampling.mixtureWeights(docs, col("source"),
        size(split(col("text"), "\\s+")).cast("long"),
        alpha = 0.3, budgetTokens = 1e4).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("p_sample"),
          r.getAs[Double]("eff_epochs"))).toMap
    val (bigTok, bigP, _) = mw("big")
    val (smallTok, smallP, smallEp) = mw("small")
    assert(bigTok == 900L && smallTok == 100L)
    // token share of `small` is 0.1; alpha=0.3 must lift it above that
    assert(smallP > 0.1 && bigP < 0.9)
    assert(math.abs(bigP + smallP - 1.0) < 1e-5)
    // small domain is traversed more than once to fill its share
    assert(math.abs(smallEp - smallP * 1e4 / 100.0) < 1e-4)
  }

  test("dedup report: one row per family with sane bounds") {
    val rows = SparkEntry.queries("q143_dedup_report")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("containment", "dup_span", "exact", "near_dup", "semantic"))
    rows.foreach { r =>
      val (u, a) = (r.getAs[Long]("n_universe"), r.getAs[Long]("n_affected"))
      assert(a >= 0 && a <= u, s"${r.getString(0)}: affected $a of $u")
      assert(math.abs(r.getAs[Double]("rate") - a.toDouble / u) < 1e-6)
    }
    // the injected exact clones (doc_id % 10 == 0 of the 500 docs)
    // are exactly what the exact rung must report dropped
    val exact = rows.find(_.getString(0) == "exact").get
    assert(exact.getAs[Long]("n_affected") == 50L)
  }

  // ---- DSIR ----------------------------------------------------------

  test("dsir: target-language docs outscore out-of-domain docs") {
    val res = SparkEntry.queries("q137_dsir_weights")(spark, sf)
      .groupBy(col("lang")).agg(avg(col("log_ratio")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 'en' trained the target model: its docs must average a higher
    // likelihood ratio than every non-latin out-of-domain slice
    assert(res("en") > res("zh"),
      s"en ${res("en")} should beat zh ${res("zh")}")
    // and the en mean must sit near 0 (a doc drawn from the target
    // distribution has ratio ~ KL-consistent, mildly positive)
    assert(res("en") > -1.0)
  }
}
