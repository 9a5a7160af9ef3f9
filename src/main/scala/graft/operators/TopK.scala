package graft.operators

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._

import graft.GraftSession.table
import graft.plans.GroupTopKPlan

/** df-level face of the whole-operator group top-k
  * ([[graft.plans.GroupTopKExec]]): each group's k best rows under
  * `order` (name → descending?), WITHOUT the window plan's full-data
  * exchange-and-sort — a partial bounded-heap pass per input
  * partition reduces the shuffle to ≤ k rows per (group, partition),
  * then a final heap merge per group. Make the ordering TOTAL
  * (include a tiebreak) for deterministic, window-identical results.
  */
object TopK {

  def groupTopK(df: DataFrame, group: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    // Resolve with the SESSION's resolver (case-insensitive by
    // default, like every other df-level API) but THROW on duplicates
    // (post-join plans often carry two attributes with the same name;
    // silently binding the first yields wrong-but-plausible top-k
    // results — advisor, r9).
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    def attr(n: String) = lp.output.filter(a => resolver(a.name, n)) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"no column $n in ${lp.output.map(_.name)}")
      case many => throw new IllegalArgumentException(
        s"ambiguous column $n: ${many.size} attributes match " +
          s"(${many.map(a => s"$n#${a.exprId.id}").mkString(", ")}) — " +
          "alias or select the intended one before groupTopK")
    }
    // Normalize float/double group keys (-0.0 → 0.0, canonical NaN):
    // the optimizer's NormalizeFloatingNumbers rule canonicalizes
    // Aggregate/Window grouping but does not match this custom node,
    // and both the UnsafeRow map key AND the hash exchange distinguish
    // the two zero bit patterns — without this a ±0.0 group splits in
    // two, diverging from PARTITION BY semantics (r9 review fix).
    val gk = group.map(n => GraftPlanBridge.normalizeFloats(attr(n)))
    val so = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending) }
    GraftPlanBridge.ofRows(df.sparkSession,
      GroupTopKPlan(lp, gk, so, k))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_group_topk" -> ((s, dir) =>
      // q100's quota semantics through the NATIVE operator: 10 longest
      // docs per source, doc_id tiebreak (k below the per-source doc
      // count at every SF, so heap eviction is actually exercised) — and because bounded heaps
      // under a total order lose nothing, the gate is HASH-exact
      // against the ROW_NUMBER oracle, not rows-only.
      groupTopK(table(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars")),
        group = Seq("source"),
        order = Seq(("n_chars", true), ("doc_id", false)), k = 10)
        .orderBy(col("source"), col("n_chars").desc, col("doc_id"))),

    "q178_knn_docs" -> ((s, dir) => {
      // Per-doc k-nearest-documents from the VERIFIED near-dup pairs
      // (q61's machinery, string-shared in the oracle) ranked through
      // the NATIVE top-k plan — the "more like this" surface a corpus
      // browser serves, and the custom operator composing inside a
      // pipeline rather than standing alone. Pairs symmetrize first
      // (kNN is per-endpoint); ordering (jaccard desc, neighbor asc)
      // is total, so the gate stays hash-exact.
      // ckpt: the verified-pair pipeline (LSH candidates + three-way
      // verify joins) feeds BOTH union branches; ReuseExchange dedups
      // only the shuffles, so without this every post-shuffle stage
      // ran twice (the q93 multi-consumer rule — r9 review fix)
      val pairs = graft.GraftSession.ckpt(
        Dedup.lshVerifiedPairs(table(s, dir, "documents"))
          .select(col("doc_a"), col("doc_b"), col("jaccard")))
      val sym = pairs
        .union(pairs.select(col("doc_b").as("doc_a"),
          col("doc_a").as("doc_b"), col("jaccard")))
        .select(col("doc_a").as("doc_id"), col("doc_b").as("neighbor"),
          col("jaccard"))
      groupTopK(sym, group = Seq("doc_id"),
        order = Seq(("jaccard", true), ("neighbor", false)), k = 3)
        .orderBy(col("doc_id"), col("jaccard").desc, col("neighbor"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q176_group_topk" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 10
        |ORDER BY source, n_chars DESC, doc_id""".stripMargin,

    "q178_knn_docs" ->
      (s"""WITH pairs AS (${Dedup.lshVerifiedSql}),
          |sym AS (
          |  SELECT doc_a AS doc_id, doc_b AS neighbor, jaccard FROM pairs
          |  UNION ALL
          |  SELECT doc_b, doc_a, jaccard FROM pairs),
          |ranked AS (
          |  SELECT doc_id, neighbor, jaccard,
          |    ROW_NUMBER() OVER (PARTITION BY doc_id
          |      ORDER BY jaccard DESC, neighbor) AS rn
          |  FROM sym)
          |SELECT doc_id, neighbor, jaccard FROM ranked WHERE rn <= 3
          |ORDER BY doc_id, jaccard DESC, neighbor""".stripMargin)
  )
}
