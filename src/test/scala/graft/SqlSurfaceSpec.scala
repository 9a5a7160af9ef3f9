package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofNative, LshIndex, TopK}

/** SQL-only reach for the custom whole-operator plans (r9): the
  * `asof_join` / `group_topk` table-valued functions must round-trip
  * through `spark.sql`, produce results identical to the Dataset
  * faces, and plan the SAME custom physical operators.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val trades = (0 until 400).map { i =>
    (i % 7L, 100L + i * 3L, s"trade-$i")
  }.toDF("symbol", "ts", "tag")
  private lazy val quotes = (0 until 150).map { i =>
    (i % 7L, 90L + i * 7L, 10.0 + i)
  }.toDF("symbol", "q_ts", "px")

  test("asof_join TVF: spark.sql result equals the Dataset face, custom plan used") {
    trades.createOrReplaceTempView("sqlsurf_trades")
    quotes.createOrReplaceTempView("sqlsurf_quotes")
    val viaSql = spark.sql(
      "SELECT * FROM asof_join('sqlsurf_trades', 'sqlsurf_quotes', " +
        "'symbol', 'ts', 'q_ts')")
    val viaDs = AsofNative.asofJoin(trades, quotes,
      "symbol", "symbol", "ts", "q_ts")
    assert(viaSql.columns.sameElements(viaDs.columns))
    assert(viaSql.collect().map(_.toString).sorted
      .sameElements(viaDs.collect().map(_.toString).sorted),
      "SQL and Dataset as-of joins diverged")
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom as-of operator not planned:\n$plan")
  }

  test("group_topk TVF: spark.sql result equals the Dataset face, custom plan used") {
    trades.createOrReplaceTempView("sqlsurf_trades")
    val viaSql = spark.sql(
      "SELECT * FROM group_topk('sqlsurf_trades', 'symbol', 'ts DESC, tag', 5)")
    val viaDs = TopK.groupTopK(trades, Seq("symbol"),
      Seq(("ts", true), ("tag", false)), 5)
    assert(viaSql.collect().map(_.toString).sorted
      .sameElements(viaDs.collect().map(_.toString).sorted),
      "SQL and Dataset group top-k diverged")
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), s"custom top-k operator not planned:\n$plan")
  }

  private lazy val lshBase = "the quick brown fox jumps over the lazy " +
    "dog near the river while seventeen green turtles carry packages"
  private lazy val lshCorpus = Seq(
    1L -> lshBase,
    2L -> lshBase.replace("lazy", "sleepy"),
    3L -> ("entirely different content with no shared shingles zebra " +
      "xylophone quantum marmalade frequencies oscillate wildly here"))
    .toDF("doc_id", "text")

  test("lsh_candidate_pairs TVF: spark.sql result equals the standing-index Dataset face") {
    // r12 verdict ask #5: a SQL-only session must reach the standing
    // snapshot artifact. The TVF and the Dataset face must resolve the
    // SAME fingerprint-keyed cache entry and answer identically.
    val dir = java.nio.file.Files.createTempDirectory("sqlsurf-lsh").toString
    lshCorpus.write.parquet(s"$dir/documents.parquet")
    val viaSql = spark.sql("SELECT * FROM lsh_candidate_pairs(" +
      s"'$dir/documents.parquet', '$dir/cache')")
    val ix = LshIndex.buildOrLoad(spark,
      spark.read.parquet(s"$dir/documents.parquet"),
      s"$dir/documents.parquet", s"$dir/cache")
    val viaDs = LshIndex.candidatePairs(ix)
    assert(viaSql.columns.sorted.sameElements(viaDs.columns.sorted))
    assert(viaSql.collect().map(_.toString).sorted
      .sameElements(viaDs.collect().map(_.toString).sorted),
      "SQL and Dataset candidate pairs diverged")
    assert(viaSql.count() >= 1L, "the near-dup pair (1,2) must surface")
  }

  test("lsh_probe TVF: spark.sql result equals the standing-index Dataset face") {
    val dir = java.nio.file.Files.createTempDirectory("sqlsurf-lsh").toString
    lshCorpus.write.parquet(s"$dir/documents.parquet")
    val batch = Seq(100L -> lshBase, 101L -> ("brand new never seen " +
      "before text with its own vocabulary completely disjoint words"))
      .toDF("doc_id", "text")
    batch.createOrReplaceTempView("sqlsurf_lsh_batch")
    val viaSql = spark.sql("SELECT * FROM lsh_probe(" +
      s"'$dir/documents.parquet', 'sqlsurf_lsh_batch', '$dir/cache')")
    val ix = LshIndex.buildOrLoad(spark,
      spark.read.parquet(s"$dir/documents.parquet"),
      s"$dir/documents.parquet", s"$dir/cache")
    val viaDs = LshIndex.probe(ix, batch)
    assert(viaSql.columns.sorted.sameElements(viaDs.columns.sorted))
    assert(viaSql.collect().map(_.toString).sorted
      .sameElements(viaDs.collect().map(_.toString).sorted),
      "SQL and Dataset probes diverged")
    assert(viaSql.collect().exists(r => r.getLong(0) == 100L),
      "the re-posted doc must collide with its original via SQL too")
  }

  test("lsh TVFs resolve at EXECUTION, not analysis: EXPLAIN on a cold cache never builds") {
    // r13 ADVICE (medium): the builders used to run
    // LshIndex.buildOrLoad at SQL ANALYSIS time, so EXPLAIN / CREATE
    // VIEW over a cold corpus executed the full signature build — and
    // serialized every concurrent analysis behind buildOrLoad's
    // JVM-wide lock. The deferred LshTvfPlan leaf must keep analysis
    // and physical planning side-effect free; only execution builds.
    val dir = java.nio.file.Files.createTempDirectory("sqlsurf-lsh").toString
    lshCorpus.write.parquet(s"$dir/documents.parquet")
    val cache = s"$dir/cache"
    val df = spark.sql("SELECT * FROM lsh_candidate_pairs(" +
      s"'$dir/documents.parquet', '$cache')")
    val plan = df.queryExecution.executedPlan.toString // EXPLAIN's work
    assert(plan.contains("LshTvf"), s"deferred node not planned:\n$plan")
    assert(!new java.io.File(cache).exists(),
      "analysis/EXPLAIN must not trigger the one-time index build")
    // a VIEW over the TVF analyzes without building, too
    spark.sql("CREATE OR REPLACE TEMP VIEW sqlsurf_lsh_v AS " +
      s"SELECT * FROM lsh_candidate_pairs('$dir/documents.parquet', '$cache')")
    assert(!new java.io.File(cache).exists(),
      "CREATE VIEW must not trigger the one-time index build")
    // execution resolves the index (builds once) and answers exactly
    // like the Dataset face
    val viaSql = spark.sql("SELECT * FROM sqlsurf_lsh_v").collect()
    assert(new java.io.File(cache).exists(),
      "execution must have built the standing index")
    val ix = LshIndex.buildOrLoad(spark,
      spark.read.parquet(s"$dir/documents.parquet"),
      s"$dir/documents.parquet", cache)
    assert(viaSql.map(_.toString).sorted.sameElements(
      LshIndex.candidatePairs(ix).collect().map(_.toString).sorted))
  }

  test("TVF argument validation: bad arity and non-literal args fail cleanly") {
    trades.createOrReplaceTempView("sqlsurf_trades")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM group_topk('sqlsurf_trades', 'symbol', 'ts')")
        .collect()
    }
    assert(e1.getMessage.contains("4 arguments") ||
      e1.getMessage.contains("group_topk"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('sqlsurf_trades', 'nope_missing', " +
        "'symbol', 'ts', 'q_ts')").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("nope_missing") ||
      e2.getMessage.toLowerCase.contains("not found"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM lsh_candidate_pairs()").collect()
    }
    assert(e3.getMessage.contains("lsh_candidate_pairs"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("SELECT * FROM lsh_probe('/tmp/nope')").collect()
    }
    assert(e4.getMessage.contains("lsh_probe"), e4.getMessage)
  }
}
