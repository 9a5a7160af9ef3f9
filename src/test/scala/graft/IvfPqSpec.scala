package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfPq

/** IVF-PQ composition: the shortlist from probed cells must contain
  * the exact neighbors (recall through the two-stage pipeline), and
  * residual coding must beat the trivial all-cells scan shape on
  * probe volume.
  */
class IvfPqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val D = 32
  private val ClusterSize = 25

  private def center(c: Int): Array[Double] =
    Array.tabulate(D)(j => math.sin(c * 13 + j * 0.7) * 5.0)

  private lazy val vectors = (for (c <- 0 until 20; i <- 0 until ClusterSize) yield {
    val id = c * ClusterSize + i
    val emb = Array.tabulate(D)(j =>
      (center(c)(j) + ((id * 31 + j * 7) % 17 - 8) * 0.01).toFloat).toSeq
    (id.toLong, emb)
  }).toDF("vec_id", "embedding")

  private lazy val index = IvfPq.build(vectors, nCells = 16, m = 8, k = 16)

  private def exactTopK(query: Array[Float], k: Int): Seq[Long] =
    vectors.collect().map { r =>
      val emb = r.getSeq[Float](1)
      val d = emb.indices.map { j =>
        val x = emb(j) - query(j); x.toDouble * x
      }.sum
      (r.getLong(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSeq

  test("shortlist-then-rerank recovers the exact top-10") {
    // the standard serving pipeline: IVF-PQ shortlist (approximate,
    // cheap) -> exact rerank of the shortlist. On separated clusters
    // the probed cells must surface every exact neighbor.
    val query = center(11).map(v => (v + 0.005).toFloat)
    val exact = exactTopK(query, 10).toSet
    val shortlist = IvfPq.search(index, query.toSeq, topK = 50, nprobe = 4)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recalled = exact.intersect(shortlist).size
    assert(recalled >= 9, s"shortlist recall $recalled/10 too low")
  }

  test("probe volume is bounded by the probed cells, not the corpus") {
    val query = center(4).map(_.toFloat).toSeq
    val probed = IvfPq.search(index, query, topK = 500, nprobe = 2)
    val cells = probed.select(col("cell")).distinct().count()
    assert(cells <= 2, s"nprobe=2 must touch at most 2 cells: $cells")
    // and those cells hold only a fraction of the corpus
    assert(probed.count() < 500L, "2 probed cells must not cover all 500 vectors")
  }

  test("residual coding: ADC distances are non-negative and sorted output") {
    val query = center(0).map(_.toFloat).toSeq
    val rows = IvfPq.search(index, query, topK = 20, nprobe = 4)
      .select(col("adc_dist")).collect().map(_.getDouble(0)).toSeq
    assert(rows.forall(_ >= 0.0))
    assert(rows == rows.sorted)
  }
}
