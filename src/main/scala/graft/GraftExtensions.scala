package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, HammingDistance, SimHashAgg}

/** SparkSessionExtensions installer: registers graft's native SQL
  * functions so `spark.sql("SELECT cosine_sim(a, b) ...")` and
  * `call_function("cosine_sim", ...)` work on any session built with
  * `GraftSession.build` (or `--conf spark.sql.extensions=graft.GraftExtensions`),
  * plus the planner strategy for the whole-operator merge as-of join.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_dist"),
      (exprs: Seq[Expression]) => HammingDistance(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => SimHashAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("simhash64_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash64_agg"),
      (exprs: Seq[Expression]) =>
        SimHashAgg(exprs.head, bits = 64).toAggregateExpression()))
  }
}
