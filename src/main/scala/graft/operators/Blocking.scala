package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared blocking-key hygiene for banded pair searches (q50/q64
  * simhash bands, q53/q92 RHP bands). Band VALUES derived from content
  * bits are not uniform — similar docs cluster into few values by
  * design — so a raw band self-join is skew-quadratic on any corpus
  * with a dominant cluster (the q50 lesson, SKEW_AUDIT_r9). The cure
  * is the q112 stop-print rule: drop whole keys held by more than
  * 1/capDen of the corpus before the self-join, bounding every join
  * bucket at (n/capDen)² candidate pairs. A capped pair is findable
  * only inside corpus-fraction-scale duplicate clusters — the
  * cluster-representative path (q93/q141), not a pair list. */
object Blocking {

  /** Filter a banded blocking view down to its stop-capped keys.
    *
    * `bandRows` must hold exactly n×fanout rows (a fixed-size band
    * explode over n docs), so the cap predicate `keyn·capDen ≤ n` can
    * be evaluated in-plan as `keyn·capDen·fanout ≤ Σkeyn` off a 1-row
    * broadcast — no driver `count()` that would re-execute the
    * upstream fingerprint pipeline. Keys with ≤ `capFloor` members are
    * always kept: a 64-member key yields ≤ 2,016 pairs (harmless on
    * any reducer at any corpus size), and without the floor a corpus
    * smaller than capDen would cap every key to zero candidates.
    * Callers checkpoint `bandRows` first — it feeds keyCounts and both
    * sides of the subsequent self-join. */
  def stopCapped(bandRows: DataFrame, keyCols: Seq[String], fanout: Int,
      capDen: Int, capFloor: Int): DataFrame = {
    val keys = keyCols.map(col)
    val keyCounts = bandRows.groupBy(keys: _*)
      .agg(count(lit(1)).as("keyn"))
    val total = keyCounts.agg(sum(col("keyn")).as("tot"))
    val okKeys = keyCounts.crossJoin(broadcast(total))
      .filter(col("keyn") * capDen * fanout <= col("tot")
        || col("keyn") <= capFloor)
      .select(keys: _*)
    bandRows.join(broadcast(okKeys), keyCols)
  }
}
