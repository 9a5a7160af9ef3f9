package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-location (SURVEY.md §5): materialize both sides of a
  * recurring fact-fact join bucketed (and sorted) by the join key, so
  * every subsequent join is Exchange-free — each task zips the matching
  * buckets. At 100 TB this converts the dominant repeated shuffle into
  * a one-time layout cost.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (idempotent
    * overwrite). */
  def materializeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int = 16): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two bucketed tables on their bucket key — planned without a
    * shuffle when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
