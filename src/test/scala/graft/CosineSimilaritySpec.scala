package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  test("cosine_sim via SQL extension matches hand computation") {
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS c").collect().head.getDouble(0)
    val expected = (1.0 * 2 + 2.0 * 3) / (math.sqrt(5.0) * math.sqrt(13.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("cosine_sim on real embeddings: self-similarity is 1.0") {
    val emb = GraftSession.table(spark, sf, "embeddings")
    val row = emb.selectExpr("cosine_sim(embedding, embedding) AS c")
      .agg(min("c"), max("c")).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
  }

  test("hamming_dist via SQL extension: popcount of xor") {
    val r = spark.sql(
      "SELECT hamming_dist(CAST(12 AS BIGINT), CAST(10 AS BIGINT)) AS a, " +
        "hamming_dist(CAST(-1 AS BIGINT), CAST(0 AS BIGINT)) AS b, " +
        "hamming_dist(CAST(5 AS BIGINT), CAST(5 AS BIGINT)) AS c").collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 64 && r.getInt(2) == 0)
  }

  test("cosine_sim null and zero-norm handling") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a, " +
        "cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS b")
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
  }
}
