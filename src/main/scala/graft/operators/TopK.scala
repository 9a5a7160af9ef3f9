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
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column $n in ${lp.output.map(_.name)}"))
    val so = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending) }
    GraftPlanBridge.ofRows(df.sparkSession,
      GroupTopKPlan(lp, group.map(attr), so, k))
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
        .orderBy(col("source"), col("n_chars").desc, col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    "q176_group_topk" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 10
        |ORDER BY source, n_chars DESC, doc_id""".stripMargin
  )
}
