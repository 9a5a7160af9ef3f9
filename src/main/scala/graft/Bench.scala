package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/codegen per query at the smallest SF: generated code
    // depends on plan structure, not data volume, so a tiny-SF pass
    // fills the janino cache and the timed run measures steady-state
    // execution instead of first-compile latency.
    val warmDir = new java.io.File(sfDir).getParent + "/sf0.001"
    val warm = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warm).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // noop sink executes the FULL plan (sorts, projections) — a bare
    // .count() lets Catalyst delete global sorts and prune most columns,
    // under-measuring ORDER-BY-heavy queries. Each query is timed TWICE
    // and the min reported: one GC pause or page-cache miss otherwise
    // reads as a phantom 10-20x regression on a sub-second query (this
    // is exactly what round 2's q47 artifact showed — 4.4 s for a query
    // that steady-states at 0.7 s).
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best =
        try math.min(once(), once())
        catch { case e: Throwable => errors += s"$name: ${e.getMessage}"; -1.0 }
      name -> best
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val errJson = errors.map(e => "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
