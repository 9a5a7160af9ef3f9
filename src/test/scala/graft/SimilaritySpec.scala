package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Scale-shape and recall guarantees of the RHP-band blocking behind
  * q53_embedding_near_dup (VERDICT round-1 item 4: the near-dup sweep
  * must not block on a low-cardinality attribute key).
  */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf001 = "/root/testdata/sf0.01"

  test("q53 candidate pairs are far below an attribute-blocked self-join") {
    val emb = GraftSession.table(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val cands = Similarity.rhpCandidatePairs(emb).count()
    // the old label-blocked plan produced ~n^2/10 candidates; band
    // blocking must beat that by a wide margin (theory: ~n^2/64)
    assert(cands < allPairs / 20,
      s"candidates $cands not << n^2/10 = ${allPairs / 10} (n=$n)")
    assert(cands > 0, "blocking must still produce candidates")
  }

  test("band blocking recalls planted near-duplicates (cos >= 0.95)") {
    import spark.implicits._
    // deterministic corpus: 200 seeded random base vectors, plus a
    // small-perturbation twin for the first 40 (true near-dups)
    val rnd = new scala.util.Random(42)
    val bases = (0 until 200).map(i =>
      (i, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val twins = bases.take(40).map { case (i, v) =>
      (1000 + i, v.map(x => x + (rnd.nextDouble() * 0.04 - 0.02).toFloat))
    }
    val emb = (bases ++ twins).toDF("vec_id", "embedding")
    // confirm the planted pairs really are near-dups
    val planted = bases.take(40).map(_._1).toSet
    val pairCos = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 1000 === col("b.vec_id"))
      .selectExpr("a.vec_id AS vec_a", "cosine_sim(a.embedding, b.embedding) AS c")
      .collect()
    assert(pairCos.forall(_.getDouble(1) > 0.95), "planted twins must be near-dups")
    val cands = Similarity.rhpCandidatePairs(emb)
      .filter(col("vec_b") === col("vec_a") + 1000)
      .filter(col("vec_a").isin(planted.toSeq: _*))
      .count()
    // banding theory at s~0.95 sign agreement: P(collide) ~ 0.95^8 per
    // band, 1-(1-p)^4 ~ 0.93 overall; assert a safe 80%
    assert(cands >= 32, s"recall too low: $cands/40 planted pairs collided")
  }

  test("rhp stop-cap: a dominant cluster's band keys are culled, rare twins survive") {
    import spark.implicits._
    // RHP sign bits are content-derived: 300 near-identical vectors
    // (a dominant topic cluster / shared diurnal shape) land all four
    // of their band keys above the n/20 cap, so the cluster's ~45k
    // internal pairs must NOT be emitted; isolated random twins keep
    // their low-population keys and still collide.
    val rnd = new scala.util.Random(7)
    val hot = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val clones = (0 until 300).map(i =>
      (5000 + i, hot.map(x => x + (rnd.nextDouble() * 0.002 - 0.001).toFloat)))
    val bases = (0 until 100).map(i =>
      (i, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val twins = bases.take(20).map { case (i, v) =>
      (1000 + i, v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat))
    }
    val emb = (clones ++ bases ++ twins).toDF("vec_id", "embedding")
    val pairs = Similarity.rhpCandidatePairs(emb)
    val clonePairs = pairs
      .filter(col("vec_a") >= 5000 && col("vec_b") >= 5000).count()
    assert(clonePairs == 0,
      s"stop-cap failed: $clonePairs hot-cluster pairs emitted")
    val twinHits = pairs
      .filter(col("vec_b") === col("vec_a") + 1000 && col("vec_a") < 20)
      .count()
    assert(twinHits >= 16, s"rare twins lost to the cap: $twinHits/20")
  }

  test("native rhp_dots buckets are bit-equal to the declarative twin") {
    import spark.implicits._
    // real embeddings (float), both plane counts used by the queries
    val emb = GraftSession.table(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    for (planes <- Seq(16, 32)) {
      val native = Similarity.rhpBuckets(emb, planes)
        .select(col("vec_id"), col("bucket"))
      val decl = Similarity.rhpBucketsDeclarative(emb, planes)
        .select(col("vec_id"), col("bucket"))
      assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty,
        s"rhp bucket mismatch at planes=$planes")
    }
    // ragged / null-poisoned vectors: zip_with semantics (dot -> null
    // -> bit falls to otherwise(0)) must survive the native path too
    val ragged = Seq(
      (1L, Array.fill(64)(0.25)),            // happy 64-dim
      (2L, Array.fill(24)(1.0)),             // short: every dot null
      (3L, Array.fill(70)(1.0))              // long: every dot null
    ).toDF("vec_id", "embedding")
    val nr = Similarity.rhpBuckets(ragged).select("vec_id", "bucket")
    val dr = Similarity.rhpBucketsDeclarative(ragged).select("vec_id", "bucket")
    assert(nr.exceptAll(dr).isEmpty && dr.exceptAll(nr).isEmpty,
      "ragged-vector rhp bucket mismatch")
  }

  test("sax motifs: flat series symbolizes to all-b, a front burst to d-then-b") {
    import spark.implicits._
    def at(day: Int, i: Int) = new java.sql.Timestamp(
      (java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400L +
        day * 86400L + i) * 1000L)
    // user 1: one event per day for 30 days (sd = 0 -> "bbbbbb");
    // user 2: 30 events all in days 0-4 -> seg0 z=2.24 'd', rest 'b'
    val rows =
      (0 until 30).map(d => (d.toLong, at(d, 0), 1L, "e", 0.0, "{}")) ++
      (0 until 30).map(i => (100L + i, at(i % 5, i), 2L, "e", 0.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.Similarity.saxMotifs(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(got == Map("bbbbbb" -> 1L, "dbbbbb" -> 1L), s"got: $got")
  }
}
