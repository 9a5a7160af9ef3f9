package graft

/** Explain-plan audit: dumps red-flag indicators for every declared
  * query — join strategies, exchange (shuffle) counts, scan pushdown.
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // optional second arg: regex filter over query names
    val nameFilter = args.lift(1).map(_.r)
    val spark = GraftSession.build(s"local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
      try {
        // Execute to a noop sink first: AQE only finalizes join
        // strategies and codegen stages at runtime, so the pre-execution
        // plan under-reports both. The final plan renders codegen stages
        // as "*(k)" prefixes — count distinct stage ids.
        // Execute THIS QueryExecution (df.write would plan a fresh one,
        // leaving this plan's AQE un-finalized).
        val df = fn(spark, dir)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        // The finalized AQE string echoes the initial plan below the
        // final one; audit only the final section.
        val plan =
          df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        def n(p: String) = p.r.findAllIn(plan).length
        val codegenStages =
          "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        val flags = Seq(
          "cartesian" -> n("CartesianProduct"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "smj" -> n("SortMergeJoin"),
          "bhj" -> n("BroadcastHashJoin"),
          "shj" -> n("ShuffledHashJoin"),
          "exchange" -> n("Exchange (hashpartitioning|rangepartitioning|SinglePartition)"),
          "scans" -> n("FileScan parquet"),
          "pushed" -> n("PushedFilters: \\[[^\\]]"),
          "codegen" -> codegenStages)
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[audit] $name :: $flags")
      } catch {
        case e: Throwable => println(s"[audit] $name :: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
