package graft

/** Explain-plan audit: dumps red-flag indicators for every declared
  * query — join strategies, exchange (shuffle) counts, scan pushdown.
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.build(s"local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).length
        val flags = Seq(
          "cartesian" -> n("CartesianProduct"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "smj" -> n("SortMergeJoin"),
          "bhj" -> n("BroadcastHashJoin"),
          "shj" -> n("ShuffledHashJoin"),
          "exchange" -> n("Exchange (hashpartitioning|rangepartitioning|SinglePartition)"),
          "scans" -> n("FileScan parquet"),
          "pushed" -> n("PushedFilters: \\[[^\\]]"),
          "codegen" -> n("WholeStageCodegen"))
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[audit] $name :: $flags")
      } catch {
        case e: Throwable => println(s"[audit] $name :: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
