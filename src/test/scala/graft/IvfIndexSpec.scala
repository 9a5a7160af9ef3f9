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

  test("persisted IVF probe partition-prunes to the nprobe cell directories") {
    val emb = GraftSession.table(spark, sf, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val index = IvfIndex.build(corpus, nCells = 16, maxIter = 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(index, dir)
    // the inverted-file layout is on disk: one dir per cell
    val cellDirs = new java.io.File(s"$dir/assignments").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.length > 4, s"expected per-cell dirs, got ${cellDirs.toSeq}")

    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.length == 16)
    assert(loaded.centroids.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)

    val probed = IvfIndex.search(loaded, qv, k = 10, nprobe = 4)
    val rows = probed.collect()
    assert(rows.nonEmpty)
    // the probe's cell predicate must reach the scan as a PARTITION
    // filter (directory pruning), not a post-scan data filter
    val plan = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val partFilters = "PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r
      .findFirstIn(plan)
    assert(partFilters.isDefined,
      s"probe scan has no cell partition filter:\n$plan")

    // and the persisted probe returns exactly the in-memory probe's ids
    val inMem = IvfIndex.search(index, qv, k = 10, nprobe = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == inMem)
  }
}
