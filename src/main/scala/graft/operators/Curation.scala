package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call training-data curation: the composition of the C-pack —
  * quality gate → exact dedup → LSH near-dup dedup → benchmark
  * contamination screen → per-source quota — as a single lazy
  * DataFrame program. Output = the input docs plus a `verdict` column:
  * `keep`, or the FIRST stage that dropped the doc (`quality`,
  * `exact_dup`, `near_dup`, `contaminated`, `source_cap`).
  *
  * Scale shape: every stage is the proven per-query plan — quality is
  * scan-side flags (no shuffle), exact dedup one content-hash
  * aggregation, near-dup the banded LSH + star-contraction components
  * (never an all-pairs join), contamination a broadcast of the BENCH
  * gram set (the corpus-side gram stream never shuffles against
  * itself), the quota one window over the uniform source key. Nothing
  * here forces an action: verdict counts are one extra aggregation on
  * the returned frame, and the kept corpus is a filter.
  *
  * Verdict precedence is pipeline order, and each stage only examines
  * the previous stage's survivors — a low-quality clone can never
  * claim exact-dup survivorship from a clean original, and quota ranks
  * are computed over docs that survived everything else.
  */
object Curation {

  val Stages: Seq[String] =
    Seq("quality", "exact_dup", "near_dup", "contaminated", "source_cap")

  /** The streaming face of the first two curation stages: the quality
    * gate is stateless scan-side work (it applies to a stream
    * unchanged — StreamBatchParitySpec proves batch/stream equality),
    * and exact dedup becomes watermark-bounded streaming state
    * ([[graft.streaming.TopicStream.dedupByContent]]). Near-dup/LSH,
    * contamination and quotas are batch stages by nature (they need
    * corpus-wide views); run them on the accumulated output — this is
    * the standard lambda split for a live ingest front.
    */
  def curateStream(stream: DataFrame, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    graft.streaming.TopicStream.dedupByContent(
      TextOps.qualityFilter(stream).filter(col("keep") === 1),
      contentCol = "text", tsCol = tsCol, watermark = watermark)

  def curate(docs: DataFrame, bench: DataFrame,
      capPerSource: Int = 1000): DataFrame = {
    // 1. quality: scan-side composite gate (TextOps.qualityFilter)
    val qual = TextOps.qualityFilter(docs)
      .select(col("doc_id").as("q_id"), col("keep").as("q_ok"))
    val qualityOk = docs.join(qual, col("doc_id") === col("q_id"))
      .filter(col("q_ok") === 1).drop("q_id", "q_ok")

    // 2. exact dedup over quality survivors: survivor = min doc_id per
    // content hash (one map-side-combinable aggregation)
    val exactKeep = qualityOk
      .groupBy(xxhash64(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("e_id"))
      .select(col("e_id"))
    val exactOk = qualityOk.join(exactKeep,
      col("doc_id") === col("e_id"), "left_semi")

    // 3. near-dup over exact survivors: banded LSH candidates → star
    // components; every non-representative node (label != own id) drops
    val nearDropped = Dedup
      .connectedComponentsStar(
        Dedup.lshCandidates(exactOk).select(col("doc_a"), col("doc_b")))
      .filter(col("node") =!= col("label"))
      .select(col("node").as("n_id"))

    // 4. contamination: any 3-gram shingle shared with the bench set;
    // the bench grams broadcast (q69's shape)
    val benchGrams = Dedup.shingleHashes(bench)
      .select(col("h1"), col("h2")).distinct()
    val contaminated = Dedup.shingleHashes(exactOk)
      .join(broadcast(benchGrams), Seq("h1", "h2"))
      .select(col("doc_id").as("c_id")).distinct()

    // 5. per-source quota among docs surviving all prior stages,
    // best-first by n_chars (q100's shape)
    val priorOk = exactOk
      .join(nearDropped, col("doc_id") === col("n_id"), "left_anti")
      .join(contaminated, col("doc_id") === col("c_id"), "left_anti")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val capped = priorOk
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > capPerSource)
      .select(col("doc_id").as("k_id"))

    // stitch: left-join each stage's drop/keep marker, precedence in
    // pipeline order
    docs
      .join(qual, col("doc_id") === col("q_id"), "left")
      .join(exactKeep.withColumn("e_keep", lit(1)),
        col("doc_id") === col("e_id"), "left")
      .join(nearDropped.withColumn("n_drop", lit(1)),
        col("doc_id") === col("n_id"), "left")
      .join(contaminated.withColumn("c_drop", lit(1)),
        col("doc_id") === col("c_id"), "left")
      .join(capped.withColumn("k_drop", lit(1)),
        col("doc_id") === col("k_id"), "left")
      .withColumn("verdict",
        when(col("q_ok") =!= 1, lit("quality"))
          .when(col("e_keep").isNull, lit("exact_dup"))
          .when(col("n_drop") === 1, lit("near_dup"))
          .when(col("c_drop") === 1, lit("contaminated"))
          .when(col("k_drop") === 1, lit("source_cap"))
          .otherwise(lit("keep")))
      .drop("q_id", "q_ok", "e_id", "e_keep", "n_id", "n_drop",
        "c_id", "c_drop", "k_id", "k_drop")
  }
}
