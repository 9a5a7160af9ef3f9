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

  test("GraftFunctions facade wrappers delegate to the registered functions") {
    import spark.implicits._
    import graft.functions.GraftFunctions._
    // hamming: 0b1011 vs 0b0010 -> bits {0,3} differ
    val h = Seq((11L, 2L)).toDF("a", "b")
      .select(hamming_dist(col("a"), col("b"))).head.getInt(0)
    assert(h == 2)
    val sh = Seq("alpha", "beta").toDF("t")
      .select(xxhash64(col("t")).as("f"))
      .agg(simhash_agg(col("f")), simhash64_agg(col("f"))).head
    assert(!sh.isNullAt(0) && !sh.isNullAt(1))
    val members = Seq(3L, 10L, 17L).toDF("v")
    val bloom = members.agg(bloom_agg(col("v"), 100L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val probed = (0L until 100L).toDF("v")
      .filter(bloom_might_contain(lit(bloom), col("v")))
      .collect().map(_.getLong(0)).toSet
    assert(Set(3L, 10L, 17L).subsetOf(probed))
  }
}
