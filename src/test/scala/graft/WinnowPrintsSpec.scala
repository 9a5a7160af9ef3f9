package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** winnow_prints must be byte-faithful to the declarative HOF chain it
  * replaced — same lowercase, split, md5 gram hash, window min, sorted
  * distinct — including whitespace and unicode edge cases.
  */
class WinnowPrintsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** The exact q111 chain as it stood before the native expression. */
  private def declarative(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("toks", split(lower(col("text")), "\\s+"))
    .filter(size(col("toks")) >= 6)
    .withColumn("hs", expr(
      "transform(sequence(1, size(toks) - 2), " +
        "i -> cast(conv(substring(md5(concat_ws(' ', slice(toks, i, 3))), 1, 8), 16, 10) as bigint))"))
    .withColumn("prints", array_sort(array_distinct(expr(
      "transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4)))"))))
    .select(col("doc_id"), col("prints"))

  private def native(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("prints", call_function("winnow_prints", col("text")))
    .filter(size(col("prints")) > 0)
    .select(col("doc_id"), col("prints"))

  test("native pass equals the declarative chain on edge-case docs") {
    val docs = Seq(
      (1L, "The Quick Brown Fox Jumps Over The LAZY dog again today"),
      (2L, "  leading and   multiple   spaces between tokens here now  "),
      (3L, "tab\tseparated and newline\nseparated tokens mixed in here"),
      (4L, "Кириллица ТОЖЕ понижается корректно в этом длинном тексте да"),
      (5L, "five tokens not enough here"),
      (6L, "exactly six tokens right here now ok")
    ).toDF("doc_id", "text")
    val d = declarative(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val n = native(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n == d, s"native $n != declarative $d")
    assert(!n.contains(5L), "sub-6-token doc excluded on both paths")
  }

  test("native pass equals the declarative chain on real corpus text") {
    val docs = GraftSession.table(spark, sf, "documents")
    val d = declarative(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val n = native(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n == d)
  }
}
