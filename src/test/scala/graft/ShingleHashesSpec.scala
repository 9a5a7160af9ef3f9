package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The native shingle_hashes kernel must be byte-faithful to the
  * declarative split → concat_ws → md5 → conv chain it replaced —
  * every oracle mirror depends on that equality.
  */
class ShingleHashesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** The pre-r8 declarative chain, verbatim. */
  private def declarative(docs: org.apache.spark.sql.DataFrame) =
    Dedup.shingles(docs)
      .select(col("doc_id"), Dedup.baseHash(col("sh")).as("h1"),
        Dedup.baseHashHi(col("sh")).as("h2"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

  test("kernel stream equals the declarative chain on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(canon(Dedup.shingleHashStream(docs)) == canon(declarative(docs)))
  }

  test("kernel matches on whitespace edge cases the regex split defines") {
    // leading whitespace -> leading empty token (limit -1 semantics);
    // multi-space runs collapse; tab/newline count as \s; <3 tokens
    // yield no shingles
    val docs = Seq(
      (1L, "  a b c"),
      (2L, "a  b\tc\nd"),
      (3L, "one two"),
      (4L, "x y z")).toDF("doc_id", "text")
    assert(canon(Dedup.shingleHashStream(docs)) == canon(declarative(docs)))
    assert(Dedup.shingleHashStream(docs)
      .filter(col("doc_id") === 3L).count() == 0)
  }

  test("distinct face keeps the (doc_id, h1, h2) contract") {
    val docs = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    // 7 shingle positions but only 3 distinct shingles
    assert(Dedup.shingleHashStream(docs).count() == 7)
    assert(Dedup.shingleHashes(docs).count() == 3)
  }
}
