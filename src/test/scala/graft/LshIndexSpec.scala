package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, LshIndex}

/** The standing near-dup index (r10 verdict ask #1): a probe against a
  * persisted index must be byte-identical to the index-free
  * incremental path, survive append, engage the star-cap, and never
  * answer from a stale cache. */
class LshIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog near " +
    "the river while seventeen green turtles carry packages across the water"
  private def corpus = docs(
    1L -> base,
    2L -> base.replace("lazy", "sleepy"),
    3L -> ("entirely different content with no shared shingles at all " +
      "zebra xylophone quantum marmalade frequencies oscillate wildly"),
    4L -> ("spark catalyst optimizer exchanges partitions broadcast " +
      "joins whole stage codegen tungsten memory format columnar scans"))
  private def batch = docs(
    100L -> base,                                   // re-post of doc 1
    101L -> ("brand new never seen before text with its own vocabulary " +
      "completely disjoint from everything already in the standing corpus"))

  private def probeSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("probe against a persisted index == index-free incremental candidates") {
    val dir = Files.createTempDirectory("lshix").toString
    val ix = LshIndex.build(corpus, s"$dir/ix")
    val viaIndex = probeSet(LshIndex.probe(ix, batch))
    val direct = probeSet(Dedup.incrementalLshCandidates(corpus, batch))
    assert(viaIndex == direct, s"index probe diverged: $viaIndex vs $direct")
    assert(viaIndex.exists { case (b, c, _) => b == 100L && c == 1L },
      s"re-post must collide with its original: $viaIndex")
    // load() round-trip answers identically
    val reloaded = LshIndex.load(spark, s"$dir/ix")
    assert(probeSet(LshIndex.probe(reloaded, batch)) == direct)
  }

  test("append: index grown doc-by-doc == index built on the full corpus") {
    val dir = Files.createTempDirectory("lshix").toString
    val full = LshIndex.build(corpus, s"$dir/full")
    val grown = LshIndex.build(corpus.filter(col("doc_id") <= 2), s"$dir/grown")
    LshIndex.append(grown, corpus.filter(col("doc_id") > 2))
    assert(probeSet(LshIndex.probe(grown, batch)) ==
      probeSet(LshIndex.probe(full, batch)))
    // signature sets identical, not just probe answers
    val a = full.signatures.orderBy("doc_id").collect().toSeq
    val b = grown.signatures.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("append is idempotent: re-appending indexed docs adds nothing") {
    val dir = Files.createTempDirectory("lshix").toString
    val ix = LshIndex.build(corpus, s"$dir/ix")
    val n0 = ix.signatures.count()
    LshIndex.append(ix, corpus) // crashed-cycle re-run shape
    assert(ix.signatures.count() == n0,
      "re-appended docs must be skipped, not duplicated")
  }

  test("star-cap engages in the persisted probe table: viral bucket enters via its anchor") {
    // 150 exact copies: every band key of the copied text is a
    // 150-member bucket (> 64 and > tot/(20*BANDS)) — the probe table
    // must hold ONE anchor row per hot key, and a probing re-post must
    // match the anchor only, not all 150 members.
    val viral = (0L until 150L).map(i => (500L + i) -> base) ++
      Seq(1L -> ("one ordinary standalone document with completely " +
        "unrelated vocabulary talking about gardens tomatoes rainfall"))
    val dir = Files.createTempDirectory("lshix").toString
    val ix = LshIndex.build(docs(viral: _*), s"$dir/ix")
    val got = probeSet(LshIndex.probe(ix, docs(9000L -> base)))
    assert(got.size == 1 && got.head._2 == 500L,
      s"probe must hit the bucket anchor alone: $got")
    // identical to the index-free guard
    assert(got == probeSet(
      Dedup.incrementalLshCandidates(docs(viral: _*), docs(9000L -> base))))
    // and the probe table is star-capped on disk, not just at probe time
    val probeRows = ix.probeSide.count()
    assert(probeRows < 150L * 4 / 2,
      s"persisted probe side must not fan out the viral bucket: $probeRows rows")
  }

  test("buildOrLoad: cache hit on the same snapshot, rebuild on rewrite") {
    val dir = Files.createTempDirectory("lshix").toString
    val cacheRoot = s"$dir/cache"
    corpus.write.parquet(s"$dir/documents.parquet")
    val stored = spark.read.parquet(s"$dir/documents.parquet")
    val ix1 = LshIndex.buildOrLoad(spark, stored, s"$dir/documents.parquet", cacheRoot)
    val ix2 = LshIndex.buildOrLoad(spark, stored, s"$dir/documents.parquet", cacheRoot)
    assert(ix1.path == ix2.path, "same snapshot must hit the same cached index")
    // rewrite the corpus (different content) -> different fingerprint;
    // the old cache entry must NOT answer for the new data
    spark.read.parquet(s"$dir/documents.parquet").limit(0)
    docs(7L -> "fresh corpus rewritten from scratch with new content words here")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val stored2 = spark.read.parquet(s"$dir/documents.parquet")
    val ix3 = LshIndex.buildOrLoad(spark, stored2, s"$dir/documents.parquet", cacheRoot)
    assert(ix3.path != ix1.path, "rewritten corpus must get a fresh index")
    assert(ix3.signatures.count() == 1L)
  }

  test("generations: an in-flight probe survives one append; older gens retire") {
    val dir = Files.createTempDirectory("lshix").toString
    val ix = LshIndex.build(corpus.filter(col("doc_id") <= 2), s"$dir/ix")
    // plan a probe against gen-1 BEFORE appending
    val inFlight = LshIndex.probe(ix, batch)
    val expectedOld = probeSet(LshIndex.probe(ix, batch))
    LshIndex.append(ix, corpus.filter(col("doc_id") > 2)) // publishes gen-2
    // the in-flight plan still reads gen-1's files — executing it after
    // the append must neither throw nor see gen-2
    assert(probeSet(inFlight) == expectedOld,
      "a probe planned before an append must keep its snapshot")
    assert(new java.io.File(s"$dir/ix/gen-1").exists(),
      "one generation must be retained for in-flight readers")
    // fresh probes see the appended corpus
    assert(probeSet(LshIndex.probe(ix, batch)) ==
      probeSet(Dedup.incrementalLshCandidates(corpus, batch)))
    // a second append publishes gen-3 and retires gen-1
    LshIndex.append(ix, docs(42L ->
      "completely novel appended document with fresh vocabulary about lighthouses"))
    assert(!new java.io.File(s"$dir/ix/gen-1").exists(),
      "generations older than current-1 must be garbage-collected")
    assert(new java.io.File(s"$dir/ix/gen-2").exists() &&
      new java.io.File(s"$dir/ix/gen-3").exists())
  }

  test("pairs ledger: append accumulates, empty index reads an empty frame") {
    val dir = Files.createTempDirectory("lshix").toString
    val ix = LshIndex.build(corpus, s"$dir/ix")
    assert(ix.pairs.count() == 0L)
    import spark.implicits._
    LshIndex.appendPairs(ix, Seq((1L, 2L)).toDF("doc_a", "doc_b"))
    LshIndex.appendPairs(ix, Seq((1L, 100L)).toDF("doc_a", "doc_b"))
    assert(ix.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 100L)))
  }
}
