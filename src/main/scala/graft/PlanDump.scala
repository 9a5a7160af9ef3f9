package graft

/** Scratch diagnostic main (not part of the driver contract): writes
  * `.explain("formatted")` output for each declared query to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence
  * files the optimization rounds commit under plans/rNN/.
  *
  * The plan is captured AFTER a noop-sink execution so AQE has
  * finalized join strategies and stage boundaries; the formatted
  * string then reflects the final plan (AdaptiveSparkPlan
  * isFinalPlan=true) rather than the pre-execution guess.
  *
  * Run: sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [nameRegex]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r14")
    val suffix = args.lift(2).getOrElse("before")
    val nameFilter = args.lift(3).map(_.r)
    new java.io.File(outDir).mkdirs()
    val spark = GraftSession.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          // execute this QueryExecution so the adaptive plan finalizes
          df.queryExecution.toRdd.foreachPartition(_ => ())
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          // r14 verdict ask #9: the formatted dump alone hides the
          // expression trees (an md5-chain removal is invisible in it),
          // so append the extended-mode plan — expressions visible —
          // in the same evidence file.
          val ext = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
          val w = new java.io.PrintWriter(
            s"$outDir/${name}_$suffix.txt", "UTF-8")
          try {
            w.println(txt)
            w.println()
            w.println("==== extended (expressions visible) ====")
            w.println(ext)
          } finally w.close()
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable =>
            println(s"[plandump] $name :: ERROR ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
