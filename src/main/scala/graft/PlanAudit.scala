package graft

/** Explain-plan audit: dumps red-flag indicators for every declared
  * query — join strategies, exchange (shuffle) counts, scan pushdown —
  * plus RUNTIME scan metrics (rows out of every parquet scan, bytes of
  * the files read). Plan-shape counts catch cartesians and funnels,
  * but a RE-EXECUTED subtree (the q131/q143 class: a shared frame
  * recomputed per consumer) only shows up in how many rows the scans
  * actually produced — rows_scanned makes a recompute regression
  * visible in the artifact itself (r9 verdict ask #5).
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

  /** Every FileSourceScanExec in the FINAL adaptive plan, deduped by
    * identity (a ReusedExchange shares its child's node — counting it
    * twice would double its metrics, which are shared anyway).
    * Shared with ScaleSmoke's index-probe scan-discipline assert. */
  private[graft] def collectScans(p: SparkPlan,
      seen: java.util.IdentityHashMap[SparkPlan, Boolean]):
      Seq[FileSourceScanExec] = {
    if (seen.containsKey(p)) Seq.empty
    else {
      seen.put(p, true)
      val here = p match {
        case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan, seen)
        case q: QueryStageExec => collectScans(q.plan, seen)
        case r: ReusedExchangeExec => collectScans(r.child, seen)
        case s: FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(collectScans(_, seen)) ++
        p.subqueries.flatMap(collectScans(_, seen))
    }
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // optional second arg: regex filter over query names
    val nameFilter = args.lift(1).map(_.r)
    val spark = GraftSession.build(s"local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    // Listener-side input metrics: rows_scanned (plan walk) misses
    // subtrees that execute as EAGER jobs during query construction —
    // localCheckpoints, index builds — exactly where a recompute
    // regression can hide. Task-level input metrics see every job the
    // query triggers, whoever planned it.
    val jobRows = new java.util.concurrent.atomic.AtomicLong
    val jobBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          Option(t.taskMetrics).foreach { m =>
            jobRows.addAndGet(m.inputMetrics.recordsRead)
            jobBytes.addAndGet(m.inputMetrics.bytesRead)
            ()
          }
      })
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
      try {
        val rows0 = jobRows.get(); val bytes0 = jobBytes.get()
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
        // runtime scan metrics off the executed plan: total rows the
        // parquet scans emitted (post-pushdown — a recomputed subtree
        // shows as a multiple of the table size) and file bytes read
        val scans = collectScans(df.queryExecution.executedPlan,
          new java.util.IdentityHashMap[SparkPlan, Boolean]())
        val rowsScanned = scans
          .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
        val scanBytes = scans
          .flatMap(_.metrics.get("filesSize")).map(_.value).sum
        // listener delta covers EVERY job this query triggered, eager
        // ckpts and index builds included (listener events are async —
        // settle until the counters stop moving before snapshotting).
        // The settle condition covers BOTH counters: a trailing job
        // that reads bytes but zero records (empty-partition or
        // metadata-only scans) would otherwise settle early and leak
        // its bytes into the NEXT query's delta (r10 ADVICE).
        var prevSeen = (-1L, -1L)
        var spins = 0
        while ((jobRows.get(), jobBytes.get()) != prevSeen && spins < 50) {
          prevSeen = (jobRows.get(), jobBytes.get())
          Thread.sleep(100); spins += 1
        }
        val totRows = jobRows.get() - rows0
        val totMb = (jobBytes.get() - bytes0) / (1024 * 1024)
        println(s"[audit] $name :: $flags rows_scanned=$rowsScanned " +
          s"scan_mb=${scanBytes / (1024 * 1024)} " +
          s"job_rows_read=$totRows job_mb_read=$totMb")
      } catch {
        case e: Throwable => println(s"[audit] $name :: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
