package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}

class IvfIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  test("trained IVF: probe scans a fraction of the corpus with real recall") {
    val emb = GraftSession.table(spark, sf, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val corpus = emb.filter(col("vec_id") =!= 0)

    val index = IvfIndex.build(corpus, nCells = 16, maxIter = 5)
    assert(index.centroids.length == 16)

    // the probe must touch only a fraction of the corpus
    val probed = IvfIndex.search(index, qv, k = 10, nprobe = 4)
    val probedCells = index.assignments
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(probedCells.size > 4, "kmeans collapsed to too few cells")

    val got = probed.collect().map(_.getAs[Long]("vec_id")).toSet
    val brute = Similarity.cosineTopK(corpus, qv, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (got intersect brute).size / 10.0
    assert(recall >= 0.3, s"recall@10 = $recall too low (got=$got brute=$brute)")
  }
}
