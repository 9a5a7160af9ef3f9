import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q110_session_overlap")(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    new java.io.PrintWriter("/tmp/q110_plan.txt") { write(p); close() }
    // timed second run
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q110_session_overlap")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    println(f"second run: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
