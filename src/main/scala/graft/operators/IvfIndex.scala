package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained IVF (inverted-file) ANN index over an embedding column
  * (SURVEY.md §2.C7 scale path, trained variant): k-means cells are
  * learned from the data, vectors are stored by cell, and a query
  * probes only the `nprobe` nearest cells — the scan shrinks from the
  * corpus to nprobe/nCells of it. [[save]] writes the assignments
  * partitioned by `cell`, so a probe against a [[load]]ed index is
  * PARTITION PRUNING: the scan lists only the nprobe `cell=N`
  * directories (the 100 TB story — probe cost is data-proportional to
  * the probed cells, not the corpus).
  */
object IvfIndex {

  final case class Index(assignments: DataFrame, centroids: Array[Array[Double]])

  /** Train k-means cells and assign every vector (one extra `cell`
    * column on the input frame). `trainFraction` < 1 fits the
    * centroids on a seeded sample but still assigns the full frame —
    * the corpus-scale shape: centroid quality converges long before
    * the sample reaches the corpus, so training cost stays flat while
    * assignment remains the one full scan it has to be. */
  def build(emb: DataFrame, nCells: Int = 16, maxIter: Int = 10,
      trainFraction: Double = 1.0, seed: Long = 42L): Index = {
    val withVec = emb.withColumn("__features", array_to_vector(col("embedding")))
    val fitOn =
      if (trainFraction >= 1.0) withVec
      else withVec.sample(trainFraction, seed)
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("cell")
      .fit(fitOn)
    val assigned = model.transform(withVec).drop("__features")
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Persist the index: assignments laid out by cell (`cell=N/` dirs —
    * the inverted file), centroids as the tiny metadata table. */
  def save(index: Index, path: String): Unit = {
    val spark = index.assignments.sparkSession
    index.assignments.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/assignments")
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Reopen a persisted index. [[search]] on the result partition-prunes:
    * its `cell IN (probes)` filter hits the directory layout, so only
    * the probed cells' files are listed and read. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    Index(spark.read.parquet(s"$path/assignments"), cents)
  }

  /** Cosine top-k probing the `nprobe` cells whose centroids are
    * nearest the query (centroids are driver-side — they are the
    * index's tiny metadata, like any ANN library). */
  def search(index: Index, query: Seq[Float], k: Int = 10, nprobe: Int = 4): DataFrame = {
    require(index.centroids.nonEmpty &&
      query.length == index.centroids.head.length,
      s"query dim ${query.length} != index dim " +
        s"${index.centroids.headOption.map(_.length).getOrElse(0)}")
    val q = query.map(_.toDouble).toArray
    // query norm hoisted out of the per-centroid loop (it is constant
    // across centroids — r9 review cleanup)
    val qn = { var s = 0.0; var i = 0
      while (i < q.length) { s += q(i) * q(i); i += 1 }; s }
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var i = 0
      while (i < c.length) {
        dot += c(i) * q(i); na += c(i) * c(i); i += 1
      }
      if (na == 0 || qn == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(qn))
    }
    val probes = index.centroids.zipWithIndex
      .map { case (c, i) => (i, cos(c)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(nprobe).map(_._1)
    Similarity.cosineTopK(
      index.assignments.filter(col("cell").isin(probes.toSeq: _*)), query, k)
  }
}
