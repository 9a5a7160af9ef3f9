package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Snapshot diff — the data-versioning primitive (SURVEY.md §2.C63):
  * given two keyed snapshots of the same logical table (two crawl
  * dumps, a table before/after a backfill, yesterday's vs today's
  * curated corpus), classify every key as added / removed / changed /
  * unchanged and say WHICH columns changed. This is the audit a
  * pipeline runs before promoting a new snapshot, and the input to an
  * incremental downstream recompute (ship only added ∪ changed).
  *
  * Scale shape: ONE full-outer sort-merge join co-partitioned on the
  * key — both sides shuffle once on a uniform key, comparisons are
  * codegen'd null-safe equality per row, nothing aggregates until the
  * caller asks for counts. At 100 TB the plan is scan + scan + one
  * co-located join; bucketing both snapshots on the key (see
  * `Bucketing`) removes even that exchange for repeated diffs.
  */
object Snapshot {

  /** Per-key diff of `a` (old) vs `b` (new): returns one row per key
    * in either snapshot with `status` ∈ added | removed | changed |
    * unchanged and one boolean `chg_<col>` per compared column
    * (null-safe; false for added/removed rows — there is nothing to
    * compare against). Key columns must be unique per snapshot (the
    * usual snapshot invariant; a duplicated key would cross-product
    * in the join as it would in any keyed diff). */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val av = a.select((keys.map(col) ++
      compare.map(c => col(c).as(s"_a_$c")) :+ lit(1).as("_in_a")): _*)
    val bv = b.select((keys.map(col) ++
      compare.map(c => col(c).as(s"_b_$c")) :+ lit(1).as("_in_b")): _*)
    val joined = av.join(bv, keys, "full_outer")
    val inA = col("_in_a").isNotNull
    val inB = col("_in_b").isNotNull
    val chgCols = compare.map(c =>
      (inA && inB && !(col(s"_a_$c") <=> col(s"_b_$c"))).as(s"chg_$c"))
    val changed = compare
      .map(c => inA && inB && !(col(s"_a_$c") <=> col(s"_b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select((keys.map(col) :+
      when(inA && !inB, "removed")
        .when(inB && !inA, "added")
        .when(changed, "changed")
        .otherwise("unchanged").as("status")) ++ chgCols: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_snapshot_diff" -> ((s, dir) => {
      // Two deterministic snapshots of orders: A drops keys ≡0 mod 97
      // (rows B "added"), B drops keys ≡0 mod 89 (rows B "removed")
      // and bumps o_totalprice on keys ≡0 mod 7 / rewrites priority on
      // keys ≡0 mod 11. The gated output is the per-status audit
      // summary with per-column change counts.
      val o = table(s, dir, "orders")
      val snapA = o.filter(col("o_orderkey") % 97 =!= 0)
      val snapB = o.filter(col("o_orderkey") % 89 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 11 === 0, lit("9-RECLASSIFIED"))
            .otherwise(col("o_orderpriority")))
      diff(snapA, snapB, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderpriority"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("chg_o_totalprice").cast("long")).as("n_price_chg"),
          sum(col("chg_o_orderpriority").cast("long")).as("n_prio_chg"))
        .orderBy(col("status"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q125_snapshot_diff" ->
      """WITH a AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
        |b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 11 = 0 THEN '9-RECLASSIFIED'
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |d AS (
        |  SELECT
        |    CASE
        |      WHEN b.o_orderkey IS NULL THEN 'removed'
        |      WHEN a.o_orderkey IS NULL THEN 'added'
        |      WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |        OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |        THEN 'changed'
        |      ELSE 'unchanged' END AS status,
        |    (a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL AND
        |     a.o_totalprice IS DISTINCT FROM b.o_totalprice) AS cp,
        |    (a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL AND
        |     a.o_orderpriority IS DISTINCT FROM b.o_orderpriority) AS cr
        |  FROM a FULL OUTER JOIN b USING (o_orderkey))
        |SELECT status, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN cp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_price_chg,
        |  CAST(SUM(CASE WHEN cr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_prio_chg
        |FROM d GROUP BY status ORDER BY status""".stripMargin
  )
}
