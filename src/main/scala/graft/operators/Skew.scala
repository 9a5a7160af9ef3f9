package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's runtime skew-join split is the first line of defense (enabled
  * in GraftSession). This salted join is the static fallback for the
  * pathological case AQE can't fix: a shuffle join where one fact key
  * carries a large share of all rows (power-law user/event keys at
  * 100 TB).
  *
  * Mechanics: the fact side gets a deterministic salt in [0, S) derived
  * from a secondary column (so the hot key's rows spread over S
  * reducers); the dimension side is replicated S times with every salt
  * value. Join key becomes (key, salt) — same results, S-way spread of
  * the hot key, at the cost of S x the (small) dimension shuffle.
  */
object Skew {

  /** Deterministic salt from an arbitrary discriminator column. */
  def salt(discriminator: Column, buckets: Int): Column =
    pmod(hash(discriminator), lit(buckets)).cast("int")

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `buckets` ways.
    * `discriminator` must be a fact column with per-row variety (an
    * offset/id), so one hot key fans out across buckets. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: String, buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(col(discriminator), buckets))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
