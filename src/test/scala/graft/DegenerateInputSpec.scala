package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Drift, Similarity, TextOps}

/** Degenerate-input robustness, pinned from the r9 differential fuzz
  * gate (tools/fuzz_data.py): empty and NULL documents, NULL measures,
  * and zero-norm vectors must produce DuckDB-parity NULLs — never an
  * ANSI divide-by-zero / invalid-cast crash, and never a silently
  * dropped row. Each case here reproduced a real pre-fix failure.
  */
class DegenerateInputSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("qualityScores: empty and NULL text yield NULL ratios, no crash") {
    val out = TextOps.qualityScores(
        Seq((1L, "a solid enough document"), (2L, ""), (3L, null))
          .toDF("doc_id", "text"))
      .select("doc_id", "punct_ratio", "score")
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((false, false)))
    assert(out(2L) == ((true, true)))   // 0-length denominator -> NULL
    assert(out(3L) == ((true, true)))
  }

  test("gopherRules: empty doc fails word-count rule with NULL metrics") {
    val r = TextOps.gopherRules(Seq((7L, "")).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_word_len")))
    // bit 1 (n_words < 40) fires even though the length metrics are
    // NULL, so the doc is still rejected
    assert((r.getAs[Long]("fail_mask") & 1L) == 1L)
    assert(r.getAs[Int]("keep") == 0)
  }

  test("qualityFilter keep is an AND chain: a firing rule rejects even when another flag is NULL") {
    // empty doc: r_punct is NULL (0-length denominator) but r_short
    // definitely fires -> keep must be 0, not NULL (FALSE AND NULL)
    val r = TextOps.qualityFilter(Seq((7L, "")).toDF("doc_id", "text"))
      .select("r_punct", "keep").collect().head
    assert(r.isNullAt(0))
    assert(!r.isNullAt(1) && r.getInt(1) == 0)
  }

  test("ksTest excludes NULL samples (engines disagree on NULL sort order)") {
    // identical non-null values in both windows -> D = 0; the NULL in
    // window a must not shift the CDF (pre-fix it sorted FIRST in
    // Spark and LAST in DuckDB)
    val rows = Seq(("g", Some(1.0), true), ("g", Some(2.0), true),
      ("g", None, true), ("g", Some(1.0), false), ("g", Some(2.0), false))
    val out = Drift.ksTest(rows.toDF("g0", "v0", "wa"),
      col("g0"), col("v0"), col("wa")).collect().head
    assert(out.getAs[Long]("n_a") == 2L) // non-null sample size
    assert(out.getAs[Long]("n_b") == 2L)
    assert(out.getAs[Double]("ks_d") == 0.0)
  }

  test("keepBest survivors with a NULL content key are not lost downstream") {
    // two NULL-text docs form one family under md5(text) = NULL; the
    // survivor must still join back to per-family stats (q126 shape
    // needs a null-safe join - a plain equi-join dropped the row)
    val d = Seq((1L, "x"), (2L, "x"), (3L, null), (4L, null))
      .toDF("doc_id", "text").withColumn("h", md5(col("text")))
    val fam = d.groupBy(col("h")).agg(count(lit(1)).as("n"))
    val best = Dedup.keepBest(d, col("h"), Seq(col("doc_id").asc)).as("k")
      .join(fam.as("f"), col("k.h") <=> col("f.h"))
      .select(col("k.doc_id"), col("f.n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best == Map(1L -> 2L, 3L -> 2L))
  }

  test("kmeans assignment survives zero-norm vectors (cos NULL sorts last)") {
    // vec 0 seeds cluster 0; vec 9 is all-zero: its cosine against
    // every centroid is NULL, it must still be assigned (first
    // cluster by tiebreak), and nothing throws under ANSI
    val emb = (0L until 10L).map { i =>
      val v = if (i == 9L) Array.fill(4)(0f)
        else Array.tabulate(4)(d => (((i + d) % 3) + 1).toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssignments(emb, k = 2)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet
    assert(out == (0L until 10L).toSet)
  }
}
