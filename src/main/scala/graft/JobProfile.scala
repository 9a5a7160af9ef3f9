package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch diagnostic main (not part of the driver contract): counts
  * Spark jobs and their wall spans during one evaluation of a single
  * gated query, to locate fixed job-count overhead. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qname = if (args.length > 1) args(1) else "q113_curation_verdicts"
    // core count / shuffle partitions from the bench's own env knobs so
    // an inverse-scaling observation (more cores slower) can be
    // reproduced and bisected at both layouts
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus.toString).toInt
    val spark = GraftSession.build(s"local[$cpus]", parts)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val spans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long, Long, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time,
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(j.jobId, (j.time, "?"))
        spans.add((j.jobId, t0, j.time, d))
      }
    })
    // warm like Bench does
    SparkEntry.queries(qname)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    spans.clear()
    // construction (eager ckpts / collects / index loads) timed apart
    // from the noop action — locates whether a query's wall is serial
    // build-time jobs or the final plan's stage jobs
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(qname)(spark, sfDir)
    val tc = (System.nanoTime() - t0) / 1e6
    df.write.format("noop").mode("overwrite").save()
    val wallMs = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500)
    println(s"== $qname construct=${tc.round}ms wall=${wallMs.round}ms " +
      s"jobs=${spans.size}")
    val base = spans.get(0)._2
    spans.forEach { case (id, s, e, d) =>
      println(f"  job $id%3d +${s - base}%6dms dur=${e - s}%5dms  ${d.take(90)}")
    }
    spark.stop()
  }
}
