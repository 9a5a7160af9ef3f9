package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** The one-call curation composition (quality → exact dedup → near-dup
  * → contamination → per-source quota): verdicts partition the corpus,
  * each injected pathology is caught by the RIGHT stage, precedence
  * follows pipeline order, and the program is deterministic.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = GraftSession.table(spark, sf, "documents")

  // corpus with injected pathologies:
  //  - doc_id+200000: byte-identical clones of every 10th doc (exact dup)
  //  - doc_id 900001: a junk two-token doc (quality reject)
  private lazy val corpus = {
    import spark.implicits._
    docs
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 200000L))
      .unionByName(Seq((900001L, "tiny junk", "xx", "srcX", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  // every 97th doc stands in for the benchmark (q69's convention);
  // those docs remain IN the corpus, so they must flag as contaminated
  private lazy val bench = docs.filter(col("doc_id") % 97 === 0)

  private lazy val verdicts: Map[Long, String] =
    Curation.curate(corpus, bench, capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap

  test("every doc gets exactly one verdict from the known set") {
    assert(verdicts.size === corpus.count())
    val allowed = (Curation.Stages :+ "keep").toSet
    assert(verdicts.values.forall(allowed))
  }

  test("clones drop as exact_dup; their originals never do") {
    val cloneIds = verdicts.keySet.filter(_ >= 200000L).filter(_ < 900000L)
    assert(cloneIds.nonEmpty)
    cloneIds.foreach { id =>
      val orig = id - 200000L
      // the clone may fail quality first (precedence), but must never
      // survive while its original was dropped as a dup
      assert(verdicts(id) === "exact_dup" || verdicts(id) === "quality" ||
        verdicts(id) === "contaminated" && verdicts(orig) == "contaminated",
        s"clone $id: ${verdicts(id)}")
      assert(verdicts(orig) !== "exact_dup", s"original $orig lost to its clone")
    }
  }

  test("the junk doc drops at the quality stage") {
    assert(verdicts(900001L) === "quality")
  }

  test("bench-member docs flag as contaminated (unless dropped earlier)") {
    val benchIds = bench.collect().map(_.getAs[Long]("doc_id"))
    assert(benchIds.nonEmpty)
    val earlier = Set("quality", "exact_dup", "near_dup")
    benchIds.foreach { id =>
      assert(verdicts(id) === "contaminated" || earlier(verdicts(id)),
        s"bench doc $id leaked through: ${verdicts(id)}")
    }
  }

  test("kept docs respect the per-source quota") {
    val kept = Curation.curate(corpus, bench, capPerSource = 20)
      .filter(col("verdict") === "keep")
      .groupBy(col("source")).count().collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(r.getAs[Long]("count") <= 20L,
      s"${r.getAs[String]("source")} over quota: ${r.getAs[Long]("count")}"))
    // and with a tight quota, source_cap verdicts actually appear
    val tight = Curation.curate(corpus, bench, capPerSource = 5)
      .groupBy(col("verdict")).count().collect()
      .map(r => r.getAs[String]("verdict") -> r.getAs[Long]("count")).toMap
    assert(tight.getOrElse("source_cap", 0L) > 0L, tight.toString)
  }

  test("curate spanTrim: quotes excised, canonical intact, husks drop as dup_spans") {
    import spark.implicits._
    // a long quality-passing real doc to quote from (off the bench split)
    val qualOk = graft.operators.TextOps.qualityFilter(docs)
      .filter(col("keep") === 1 && length(col("text")) >= 320
        && col("doc_id") % 97 =!= 0)
      .orderBy(col("doc_id")).limit(1).collect()
    assert(qualOk.length == 1, "need a long quality-passing doc at this sf")
    val dId = qualOk(0).getAs[Long]("doc_id")
    val dText = qualOk(0).getAs[String]("text")
    // own content: 40 all-distinct synthetic tokens — passes every
    // quality rule by construction (n_tok >= 30, distinct_ratio 1.0,
    // no punctuation, no duplicate bigrams) and shares no char window
    // or word-3-gram with any corpus doc
    val own = (0 until 40).map(i => s"ownword$i").mkString(" ")
    val quote = dText.substring(60, 260)
    val quoter = (800002L, own + " " + quote, "en", "srcTrim",
      (own.length + 1 + quote.length).toLong)
    // near-total copy of the canonical doc (first char dropped so
    // exact dedup does NOT collapse it) — trims to a husk
    val husk = (800003L, dText.substring(1), "en", "srcTrim2",
      (dText.length - 1).toLong)
    val corpus2 = docs.unionByName(
      Seq(quoter, husk).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Curation.curate(corpus2, bench, capPerSource = 1000,
      spanTrim = true)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // default output keeps the pre-r9 schema; spanTrim adds the columns
    assert(!Curation.curate(corpus2, bench).columns.contains("text_final"))
    assert(out.columns.contains("text_final")
      && out.columns.contains("masked_chars"))
    // the quoting doc survives WITH the quote excised
    val k = byId(800002L)
    assert(k.getAs[String]("verdict") == "keep", k.toString)
    val tf = k.getAs[String]("text_final")
    val masked = k.getAs[Long]("masked_chars")
    assert(masked > 100L, s"quote barely trimmed: $masked")
    assert(tf.length == quoter._2.length - masked, "masked_chars conservation")
    assert(!tf.contains(quote.substring(50, 150)), "quote interior survived")
    assert(tf.startsWith(own.substring(0, 50)), "own content damaged")
    // the canonical doc keeps its text byte-intact
    assert(byId(dId).getAs[Long]("masked_chars") == 0L, "canonical trimmed")
    if (byId(dId).getAs[String]("verdict") == "keep")
      assert(byId(dId).getAs[String]("text_final") == dText)
    // the near-total copy is trimmed to a husk and dropped as dup_spans
    assert(byId(800003L).getAs[String]("verdict") == "dup_spans",
      byId(800003L).toString)
    // a short doc that was NEVER trimmed is not a husk (r9 review
    // fix): with spanTrimWin above its length it must keep flowing —
    // husk requires masked_chars > 0, not just "shorter than win"
    val shortOwn = (0 until 30).map(i => s"b$i").mkString(" ") // ~100 ch
    val corpus3 = docs.unionByName(Seq(
      (800004L, shortOwn, "en", "srcTrim3", shortOwn.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out3 = Curation.curate(corpus3, bench, capPerSource = 1000,
      spanTrim = true, spanTrimWin = 120)
    val shortRow = out3.filter(col("doc_id") === 800004L).collect()(0)
    assert(shortRow.getAs[String]("verdict") == "keep",
      s"untrimmed short doc mislabeled: $shortRow")
    assert(shortRow.getAs[Long]("masked_chars") == 0L)
  }

  test("curateStream keeps exactly the quality-passing distinct contents (batch parity)") {
    // batch expectation: distinct contents among quality keepers
    val batchKept = graft.operators.TextOps.qualityFilter(corpus)
      .filter(col("keep") === 1)
      .select(md5(col("text"))).distinct().count()
    val srcDir = java.nio.file.Files.createTempDirectory("curs").toString
    corpus.withColumn("ts", timestamp_micros(lit(1700000000000000L)))
      .coalesce(1).write.parquet(s"$srcDir/in")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        corpus.withColumn("ts", timestamp_micros(lit(0L))).schema))
      .parquet(s"$srcDir/in")
    val q = graft.operators.Curation.curateStream(stream)
      .select(col("doc_id"), md5(col("text")).as("content"))
      .writeStream.format("memory").queryName("curs").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val kept = spark.sql("SELECT content FROM curs").collect()
      assert(kept.length.toLong === batchKept,
        s"stream kept ${kept.length}, batch expects $batchKept")
      assert(kept.map(_.getString(0)).distinct.length === kept.length)
    } finally q.stop()
  }

  test("curateCycle: incremental stream→batch cycles converge to batch curate verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.log.TopicLog
    // distinct-text base so the stream front's first-arrival survivor
    // equals batch curate's min-doc_id survivor deterministically;
    // clones arrive in a LATER cycle, so the streaming dedup state
    // (not batch work) is what drops them
    val byText = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val base = docs.withColumn("__rn", row_number().over(byText))
      .filter(col("__rn") === 1).drop("__rn")
      .unionByName(Seq((900001L, "tiny junk", "xx", "srcX", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val clones = base
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 200000L)
      .withColumn("doc_id", col("doc_id") + 200000L)
    val benchSplit = base.filter(col("doc_id") % 97 === 0)
    val ts0 = timestamp_micros(lit(1700000000000000L))

    val root = java.nio.file.Files.createTempDirectory("cycle").toString
    val docsTopic = TopicLog.prepare(spark, s"$root/docs", numPartitions = 2)
    val verdictTopic = TopicLog.prepare(spark, s"$root/verdicts", numPartitions = 2)

    // cycle 1: originals only
    docsTopic.publish(Curation.docRecords(base.withColumn("ts", ts0)))
    val v1 = Curation.curateCycle(docsTopic, verdictTopic, s"$root/kept",
      s"$root/ckpt", benchSplit, capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(v1(900001L) === "quality")
    assert(!v1.values.exists(_ == "exact_dup"), "wave 1 texts are distinct")

    // cycle 2: clones arrive — only the new records are streamed
    docsTopic.publish(Curation.docRecords(clones.withColumn("ts", ts0)))
    val v2 = Curation.curateCycle(docsTopic, verdictTopic, s"$root/kept",
      s"$root/ckpt", benchSplit, capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap

    // end-to-end parity: the changelog's latest-per-key verdicts equal
    // the one-call batch composition over the full corpus
    val expected = Curation.curate(base.unionByName(clones), benchSplit,
      capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(v2.size === expected.size)
    val diff = expected.keys.filter(k => v2.get(k) != expected.get(k))
    assert(diff.isEmpty,
      diff.take(5).map(k => s"$k: got ${v2.get(k)}, want ${expected(k)}")
        .mkString("; "))

    // a cycle with NO new records (the crashed-and-rerun case) must
    // leave the changelog's latest-per-key view unchanged
    val v3 = Curation.curateCycle(docsTopic, verdictTopic, s"$root/kept",
      s"$root/ckpt", benchSplit, capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(v3 === v2, "an empty cycle changed verdicts")
  }

  test("curateCycle with a standing LshIndex: indexed cycles == one-call batch curate") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.log.TopicLog
    // same scenario as the unindexed convergence test, but the batch
    // phase maintains a persisted LshIndex: signatures computed for
    // each cycle's NEW docs only, clustering over the accumulated pair
    // ledger. Verdicts must equal the full-recompute batch composition
    // (components are provably identical; this pins it end-to-end).
    val byText = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val base = docs.withColumn("__rn", row_number().over(byText))
      .filter(col("__rn") === 1).drop("__rn")
    val clones = base
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 200000L)
      .withColumn("doc_id", col("doc_id") + 200000L)
    val benchSplit = base.filter(col("doc_id") % 97 === 0)
    val ts0 = timestamp_micros(lit(1700000000000000L))

    val root = java.nio.file.Files.createTempDirectory("cycleix").toString
    val docsTopic = TopicLog.prepare(spark, s"$root/docs", numPartitions = 2)
    val verdictTopic = TopicLog.prepare(spark, s"$root/verdicts", numPartitions = 2)
    val ixDir = Some(s"$root/lshix")

    docsTopic.publish(Curation.docRecords(base.withColumn("ts", ts0)))
    Curation.curateCycle(docsTopic, verdictTopic, s"$root/kept",
      s"$root/ckpt", benchSplit, capPerSource = 20, lshIndexDir = ixDir)
    docsTopic.publish(Curation.docRecords(clones.withColumn("ts", ts0)))
    val v2 = Curation.curateCycle(docsTopic, verdictTopic, s"$root/kept",
      s"$root/ckpt", benchSplit, capPerSource = 20, lshIndexDir = ixDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap

    val expected = Curation.curate(base.unionByName(clones), benchSplit,
      capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(v2.size === expected.size)
    val diff = expected.keys.filter(k => v2.get(k) != expected.get(k))
    assert(diff.isEmpty,
      diff.take(5).map(k => s"$k: got ${v2.get(k)}, want ${expected(k)}")
        .mkString("; "))

    // the index grew incrementally: cycle 2 indexed only the new docs
    val ix = graft.operators.LshIndex.load(spark, s"$root/lshix")
    val keptIds = spark.read.parquet(s"$root/kept")
      .select(col("doc_id")).distinct().count()
    assert(ix.signatures.count() === keptIds,
      "index must cover exactly the kept corpus")

    // an empty cycle (crash-rerun shape) changes nothing
    val v3 = Curation.curateCycle(docsTopic, verdictTopic, s"$root/kept",
      s"$root/ckpt", benchSplit, capPerSource = 20, lshIndexDir = ixDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(v3 === v2, "an empty indexed cycle changed verdicts")
  }

  test("deterministic: a second run produces identical verdicts") {
    val again = Curation.curate(corpus, bench, capPerSource = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(again === verdicts)
  }
}
