package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PqIndex

/** Product quantization: codes well-formed, encoding deterministic,
  * and ADC search resolves cluster structure (the PQ contract — it
  * ranks BETWEEN clusters; intra-cluster order needs the standard
  * exact rerank of the shortlist).
  */
class PqIndexSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val D = 32
  private val ClusterSize = 25

  private def center(c: Int): Array[Double] =
    Array.tabulate(D)(j => math.sin(c * 13 + j * 0.7) * 5.0)

  /** 20 well-separated clusters × 25 points, deterministic noise. */
  private lazy val vectors = (for (c <- 0 until 20; i <- 0 until ClusterSize) yield {
    val id = c * ClusterSize + i
    val emb = Array.tabulate(D)(j =>
      (center(c)(j) + ((id * 31 + j * 7) % 17 - 8) * 0.01).toFloat).toSeq
    (id.toLong, c, emb)
  }).toDF("vec_id", "cluster", "embedding")

  private lazy val cb = PqIndex.train(vectors, m = 8, k = 16)

  test("codes are m ints in [0, k) and encoding is layout-independent") {
    val enc = PqIndex.encode(vectors, cb)
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0L)
    val a = PqIndex.encode(vectors.repartition(7), cb)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = PqIndex.encode(vectors.repartition(2), cb)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, "codes must not depend on partitioning")
  }

  test("ADC search resolves clusters: query's cluster fills the top-k") {
    val enc = PqIndex.encode(vectors, cb)
    val query = center(7).map(_.toFloat).toSeq
    val top = PqIndex.search(enc, cb, query, topK = ClusterSize)
      .select(col("cluster")).collect().map(_.getInt(0))
    val own = top.count(_ == 7)
    assert(own >= ClusterSize - 2,
      s"expected ~all of cluster 7 in top-$ClusterSize, got $own")
    // separation, not just membership: every cluster-7 row must score
    // below (closer than) every other row under ADC
    val scored = enc.withColumn("adc", round(
        call_function("pq_adc", col("codes"),
          typedLit(PqIndex.adcTable(cb, query))), 6))
      .groupBy(col("cluster") === 7)
      .agg(min(col("adc")).as("lo"), max(col("adc")).as("hi"))
      .collect().map(r => r.getBoolean(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(scored(true)._2 < scored(false)._1,
      s"cluster-7 ADC range ${scored(true)} must sit below the rest ${scored(false)}")
  }

  test("ADC honors the codec triangle inequality: |‖q−x̂‖ − ‖q−x‖| ≤ ‖x−x̂‖") {
    // ADC computes the distance to the RECONSTRUCTION x̂, not to x —
    // so the exact, always-true bound is the triangle inequality
    // against each row's own quantization residual. This catches any
    // codec bug (wrong slice offsets, wrong LUT layout, argmin ties)
    // without assuming anything about the data.
    val enc = PqIndex.encode(vectors, cb)
    val query = center(3).map(_.toFloat).toSeq
    val qArr = query.toArray
    PqIndex.search(enc, cb, query, topK = 50)
      .select(col("adc_dist"), col("embedding"), col("codes"))
      .collect().foreach { r =>
        val emb = r.getSeq[Float](1)
        val codes = r.getSeq[Int](2)
        val recon = codes.zipWithIndex.flatMap { case (c, s) =>
          cb.centroids(s)(c)
        }
        val trueD = math.sqrt(emb.indices.map { j =>
          val d = emb(j) - qArr(j); d * d
        }.sum)
        val reconD = math.sqrt(emb.indices.map { j =>
          val d = emb(j) - recon(j); d * d
        }.sum)
        val adcD = math.sqrt(r.getDouble(0))
        assert(math.abs(adcD - trueD) <= reconD + 1e-4,
          s"triangle violated: adc=$adcD true=$trueD recon=$reconD")
      }
  }

  test("works on the real embeddings table (64-dim floats)") {
    val emb = GraftSession.table(spark, sf, "embeddings")
    val cb64 = PqIndex.train(emb, m = 8, k = 16)
    assert(cb64.dsub == 8 && cb64.centroids.forall(_.length == 16))
    val q = emb.orderBy(col("vec_id")).select(col("embedding"))
      .head.getSeq[Float](0)
    val top = PqIndex.search(PqIndex.encode(emb, cb64), cb64, q, topK = 10)
      .collect()
    assert(top.length == 10)
    assert(top.map(_.getAs[Double]("adc_dist")).toSeq.sorted ==
      top.map(_.getAs[Double]("adc_dist")).toSeq)
  }
}
