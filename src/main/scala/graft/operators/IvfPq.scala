package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ (IVFADC, Jégou et al.) — the composed billion-scale ANN
  * index: [[IvfIndex]]'s k-means cells prune the corpus to `nprobe`
  * cells, and within each cell vectors are stored as [[PqIndex]]
  * codes of their RESIDUAL from the cell centroid (residuals are
  * what PQ quantizes well — they live in a ball around zero instead
  * of spanning the whole space, so the same code budget buys much
  * finer resolution).
  *
  * Scale shape: build = one k-means pass (cells) + m seeded k-means
  * fits on the residual slices + one scan-side encode; the stored
  * frame carries (cell, codes) — m bytes of payload per vector.
  * Search = driver-side probe selection (centroids are index
  * metadata), ONE scan filtered to the probed cells (partition-pruned
  * when the frame is persisted by cell, the IvfIndex layout), with a
  * per-cell ADC lookup table — built from the query's residual
  * against THAT cell — probed natively per row. Rerank the returned
  * shortlist with the exact metric for final order (the standard
  * two-stage serving pipeline).
  */
object IvfPq {

  final case class Index(encoded: DataFrame,
      centroids: Array[Array[Double]], cb: PqIndex.Codebook)

  /** Coarse-quantize into `nCells`, then PQ-train and encode the
    * residuals. `emb` needs `embedding` (array<float|double>) and an
    * id column. `trainFraction` < 1 fits BOTH k-means stages (cells
    * and PQ codebooks) on a seeded sample while still assigning and
    * encoding the full frame — at corpus scale codebooks are always
    * trained on a sliver; only assignment/encode touch every row. */
  def build(emb: DataFrame, nCells: Int = 16, m: Int = 8, k: Int = 16,
      seed: Long = 42L, trainFraction: Double = 1.0): Index = {
    val ivf = IvfIndex.build(emb, nCells, trainFraction = trainFraction,
      seed = seed)
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ivf.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "__cent")
    val resid = ivf.assignments.join(broadcast(cents), "cell")
      .withColumn("residual",
        zip_with(col("embedding").cast("array<double>"), col("__cent"),
          (a, b) => a - b))
      .drop("__cent")
    val pqTrain =
      if (trainFraction >= 1.0) resid
      else resid.sample(trainFraction, seed)
    val cb = PqIndex.train(pqTrain, "residual", m, k, seed = seed)
    val encoded = PqIndex.encode(resid, cb, "residual").drop("residual")
    Index(encoded, ivf.centroids, cb)
  }

  /** Approximate top-`topK` by ADC over the `nprobe` nearest cells.
    * Each probed cell gets its own LUT (the query residual differs per
    * cell); the probed mass is materialized by one `cell IN (...)`
    * filter — partition-pruned against a by-cell layout — and the
    * per-cell LUT branches scan only that sliver.
    * Returns (id cols, cell, adc_dist). */
  def search(index: Index, query: Seq[Float], topK: Int = 10,
      nprobe: Int = 4, idCol: String = "vec_id"): DataFrame = {
    require(index.centroids.nonEmpty &&
      query.length == index.centroids.head.length,
      s"query dim ${query.length} != index dim " +
        s"${index.centroids.headOption.map(_.length).getOrElse(0)}")
    val q = query.map(_.toDouble).toArray
    def l2(c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < c.length) { val x = q(i) - c(i); d += x * x; i += 1 }
      d
    }
    val probes = index.centroids.zipWithIndex
      .map { case (c, i) => (i, l2(c)) }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobe).map(_._1)
    // per-cell ADC tables from the query's residual against that cell
    // — residuals stay DOUBLE end-to-end (adcTableD): stored codes
    // were trained on double residuals, and a float round-trip here
    // perturbed every distance by ~the rounding quantum (r9 review)
    val luts = probes.map { cell =>
      val res = index.centroids(cell).indices
        .map(j => q(j) - index.centroids(cell)(j))
      cell -> PqIndex.adcTableD(index.cb, res)
    }
    // materialize the probed-cell mass ONCE (≤ nprobe/nCells of the
    // corpus; directory-pruned against a by-cell layout), then each
    // per-cell branch re-filters the small materialized set. pq_adc
    // requires a FOLDABLE per-cell LUT, so the branches cannot share
    // one scan — without this a NON-partitioned frame would be
    // rescanned in full once per probe.
    val probed = graft.GraftSession.ckpt(
      index.encoded.filter(col("cell").isin(probes.toSeq: _*)))
    val perCell = luts.map { case (cell, lut) =>
      probed.filter(col("cell") === cell)
        .withColumn("adc_dist", round(
          call_function("pq_adc", col("codes"), typedLit(lut)), 6))
    }
    perCell.reduce(_ unionByName _)
      .orderBy(col("adc_dist"), col(idCol))
      .limit(topK)
      .select(col(idCol), col("cell"), col("adc_dist"))
  }
}
