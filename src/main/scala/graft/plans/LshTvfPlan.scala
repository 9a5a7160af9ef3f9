package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

import graft.operators.LshIndex

/** Deferred-resolution logical face of the `lsh_candidate_pairs` /
  * `lsh_probe` table-valued functions (r13 ADVICE, medium): the TVF
  * builders used to call [[LshIndex.buildOrLoad]] at SQL ANALYSIS
  * time, so a cache miss executed the full corpus signature build
  * (plus writer-lease acquisition and possible repair) during
  * `EXPLAIN`, `CREATE VIEW`, or any re-analysis — and `buildOrLoad`'s
  * JVM-wide synchronization serialized every concurrent analysis
  * behind that build. This leaf defers the WHOLE resolution — index
  * load/build, batch-table lookup, and the index-plan construction —
  * to [[LshTvfExec.doExecute]], which runs only when the query
  * actually executes. The TVF's output schema is static (three long
  * columns either way), so analysis needs nothing from the index.
  *
  * Trade, documented: the inner index-read plan is OPAQUE to the
  * outer query's optimizer — a predicate on the TVF's output applies
  * after the node rather than pushing into the segment scan. Callers
  * that need pushdown (or plan introspection) use the Dataset faces
  * ([[LshIndex.candidatePairs]] / [[LshIndex.probe]]), which inline
  * fully; the SQL face's contract is convenience + analysis-time
  * purity. Results are identical either way (SqlSurfaceSpec pins the
  * round-trip).
  */
case class LshTvfPlan(
    kind: LshTvfPlan.Kind,
    corpusPath: String,
    cacheRoot: String,
    batchTable: Option[String],
    output: Seq[Attribute]) extends LeafNode {
  // unknown until the index resolves; default keeps the outer planner
  // from broadcast-guessing on a leaf it cannot size
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = SQLConf.get.defaultSizeInBytes)
}

object LshTvfPlan {
  sealed trait Kind { def name: String }
  case object CandidatePairs extends Kind { val name = "lsh_candidate_pairs" }
  case object Probe extends Kind { val name = "lsh_probe" }

  private def longs(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, LongType)())

  /** Static output schemas — the whole reason deferral is possible. */
  def outputFor(kind: Kind): Seq[Attribute] = kind match {
    case CandidatePairs => longs("doc_a", "doc_b", "n_shared_bands")
    case Probe => longs("batch_id", "corpus_id", "n_shared_bands")
  }

  def apply(kind: Kind, corpusPath: String, cacheRoot: String,
      batchTable: Option[String]): LshTvfPlan =
    LshTvfPlan(kind, corpusPath, cacheRoot, batchTable, outputFor(kind))
}

class LshTvfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: LshTvfPlan =>
      LshTvfExec(p.kind, p.corpusPath, p.cacheRoot, p.batchTable,
        p.output) :: Nil
    case _ => Nil
  }
}

/** Physical face: resolves the standing index (load on a cache hit,
  * the one-time build on a miss) and plans the inner index read the
  * FIRST time the node executes — `EXPLAIN` only prints this node.
  * The inner DataFrame executes as a nested query; its output column
  * order is pinned to this node's attributes by name. */
case class LshTvfExec(
    kind: LshTvfPlan.Kind,
    corpusPath: String,
    cacheRoot: String,
    batchTable: Option[String],
    output: Seq[Attribute]) extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val ix = LshIndex.buildOrLoad(spark,
      spark.read.parquet(corpusPath), corpusPath, cacheRoot)
    val df = kind match {
      case LshTvfPlan.CandidatePairs => LshIndex.candidatePairs(ix)
      case LshTvfPlan.Probe =>
        LshIndex.probe(ix, spark.table(batchTable.getOrElse(
          throw new IllegalStateException("lsh_probe lost its batch table"))))
    }
    df.select(output.map(a =>
        org.apache.spark.sql.functions.col(a.name).cast(LongType)): _*)
      .queryExecution.toRdd
  }
}
