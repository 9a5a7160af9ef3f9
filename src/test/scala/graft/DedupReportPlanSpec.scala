package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ckpt-layout pins for the standing-index consumers (r10, verdict ask
  * #3): q143's five-rung report and q131's incremental probe must keep
  * their expensive per-doc passes OUT of the final plan — each runs
  * exactly once as an eager checkpoint job (or not at all, when the
  * persisted LshIndex already holds the artifact), never inside the
  * multi-consumer union where every rung would re-execute it. A
  * regression that drops one of these pins re-materializes a corpus
  * pass per consumer — invisible in exchange counts, visible here and
  * in PLAN_AUDIT's rows_scanned. */
class DedupReportPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.foreachPartition(_ => ())
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q143: no shingle/minhash or CDC rolling-hash pass survives into the final plan") {
    val plan = finalPlan("q143_dedup_report")
    // near-dup rung reads the index's persisted signatures (pinned by
    // lshCandidatesFromSignatures' internal ckpt) — re-tokenizing the
    // corpus inside the 5-way union would run it once per consumer
    assert(!plan.contains("shingle_hashes"),
      s"corpus shingle pass re-planned inside the report:\n${plan.take(1500)}")
    // span + containment rungs share ONE eager cdc_window_hits ckpt
    assert(!plan.contains("cdc_window_hits") &&
      !plan.contains("cdc_window_hashes"),
      s"CDC rolling-hash pass re-planned inside the report:\n${plan.take(1500)}")
  }

  test("q131: the probe-time plan never rescans the corpus (zero file scans)") {
    val plan = finalPlan("q131_incremental_lsh")
    // everything file-backed is consumed inside eager ckpts: the index
    // probe (cand), the batch and candidate-corpus shingle sets. The
    // final verification join therefore runs on pinned RDDs alone — a
    // FileScan here means a corpus rescan leaked back into probe time.
    assert(!plan.contains("FileScan"),
      s"file scan at probe time:\n${plan.take(1500)}")
    assert(!plan.contains("shingle_hashes"),
      s"shingle pass re-planned at probe time:\n${plan.take(1500)}")
  }
}
