package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search") over an embedding column — the vector
  * COMPRESSION half of the canonical IVF-PQ billion-scale ANN recipe
  * ([[IvfIndex]] is the coarse-partition half; compose by encoding
  * each IVF cell's residuals or, as here, the raw vectors).
  *
  * The embedding is split into `m` contiguous subvectors; each
  * subspace learns its own `k`-centroid k-means codebook; a vector is
  * stored as m small codes (m bytes at k ≤ 256) instead of d floats —
  * 32× compression at d=64/m=8, which is what lets the probed cells
  * of a 100 TB corpus sit in executor memory. Queries run ASYMMETRIC
  * distance computation (ADC): one m×k lookup table of exact
  * query-to-centroid subdistances is built driver-side per query
  * (tiny — the index metadata pattern of IvfIndex centroids), and
  * each row's approximate squared L2 distance is m table adds via the
  * native `pq_adc` expression — memory-bandwidth-bound, no FLOPs on
  * the scan.
  *
  * Training runs m seeded MLlib k-means fits on the subvector slices
  * (one cached pass over the training frame each); like all trained
  * indexes the codebook is data-derived, so correctness is
  * spec-asserted (codes in range, ADC ≈ true distance on clustered
  * data, recall against the exact scan) rather than oracle-mirrored.
  */
object PqIndex {

  /** codebook(s)(c) = centroid vector of code c in subspace s. */
  final case class Codebook(m: Int, k: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]]) {
    /** The foldable plan-literal layout [[graft.functions.PqEncode]]
      * reads: [m, k, dsub, then m·k·dsub values]. */
    def flat: Seq[Double] =
      Seq(m.toDouble, k.toDouble, dsub.toDouble) ++
        centroids.flatMap(_.flatMap(_.toSeq))
  }

  /** Learn the per-subspace codebooks. `emb` needs an `embedding`
    * array column of constant dimension divisible by `m`. */
  def train(emb: DataFrame, embCol: String = "embedding", m: Int = 8,
      k: Int = 16, maxIter: Int = 10, seed: Long = 42L): Codebook = {
    val dims = emb.select(size(col(embCol))).head(1)
    require(dims.nonEmpty,
      s"PqIndex.train: empty training frame (check sample fraction / corpus size)")
    val d = dims(0).getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    val slices = emb.select((0 until m).map(s =>
      array_to_vector(slice(col(embCol), s * dsub + 1, dsub).cast("array<double>"))
        .as(s"__s$s")): _*).cache()
    try {
      val centroids = (0 until m).map { s =>
        new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
          .setFeaturesCol(s"__s$s").setPredictionCol("__c")
          .fit(slices)
          .clusterCenters.map(_.toArray)
      }.toArray
      // k-means can return < k clusters on tiny data; pad by repeating
      // the first centroid so code values stay in [0, k) regardless
      val padded = centroids.map { cs =>
        if (cs.length == k) cs else cs ++ Array.fill(k - cs.length)(cs(0))
      }
      Codebook(m, k, dsub, padded)
    } finally { slices.unpersist(); () }
  }

  /** Add an array<int> `codes` column: each vector's m subspace codes
    * (scan-side native argmin — no shuffle, no UDF). */
  def encode(emb: DataFrame, cb: Codebook,
      embCol: String = "embedding"): DataFrame =
    emb.withColumn("codes",
      call_function("pq_encode", col(embCol), typedLit(cb.flat)))

  /** The query-side m×k ADC table: exact squared L2 from the query's
    * subvectors to every centroid, in pq_adc's literal layout. */
  def adcTable(cb: Codebook, query: Seq[Float]): Seq[Double] =
    adcTableD(cb, query.map(_.toDouble))

  /** Double-precision face of [[adcTable]] — IVF-PQ computes query
    * residuals in double, and truncating them to Float on the way in
    * perturbs every ADC distance by ~the round(...,6) quantum, enough
    * to flip shortlist membership between near-tied candidates (r9
    * review fix). */
  def adcTableD(cb: Codebook, query: Seq[Double]): Seq[Double] = {
    require(query.length == cb.m * cb.dsub,
      s"query dim ${query.length} != ${cb.m * cb.dsub}")
    Seq(cb.m.toDouble, cb.k.toDouble) ++
      (for (s <- 0 until cb.m; c <- 0 until cb.k) yield {
        var d = 0.0
        var j = 0
        while (j < cb.dsub) {
          val diff = query(s * cb.dsub + j) - cb.centroids(s)(c)(j)
          d += diff * diff
          j += 1
        }
        d
      })
  }

  /** Approximate k-NN by ADC over an [[encode]]d frame: per row m
    * table adds, then one top-k. Callers wanting exact ranks rerank
    * the returned shortlist with the true metric (the standard
    * PQ-then-rerank pipeline); compose with [[IvfIndex]] cell pruning
    * for the full IVF-PQ shape. */
  def search(encoded: DataFrame, cb: Codebook, query: Seq[Float],
      topK: Int = 10, idCol: String = "vec_id"): DataFrame =
    encoded
      .withColumn("adc_dist", round(
        call_function("pq_adc", col("codes"), typedLit(adcTable(cb, query))), 6))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(topK)
}
