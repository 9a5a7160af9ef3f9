package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted standing-corpus MinHash-LSH near-dup index — the ANN
  * [[IvfIndex]] save/load discipline applied to near-duplicate
  * detection (r9 verdict ask #1).
  *
  * Without an index, every re-crawl probe against a standing corpus
  * (q131, each `curateCycle` batch phase) re-runs the corpus's
  * tokenize → shingle → md5 → K-hash minhash pass AND a corpus-wide
  * band key-count aggregate — at 100 TB that is a full-corpus job per
  * probe for an artifact that only changes when the corpus does. The
  * index persists, once per corpus snapshot:
  *
  *  - `signatures/` — (doc_id, mh0..mhK-1): the per-doc minhash row,
  *    the root artifact everything else derives from (and the only
  *    thing [[append]] has to compute for NEW docs);
  *  - `keycounts/`  — (band, k1, k2, bn, anchor): per-band-key member
  *    count and min-doc_id anchor, the star-cap's inputs;
  *  - `probe/`      — the PRE-CAPPED probe side: cold band rows plus
  *    one anchor row per hot key (a viral duplicate bucket is entered
  *    through its representative, never fanned out — identical
  *    connected components, see [[Dedup.lshCandidatesFromSignatures]]).
  *
  * A [[probe]] is then: read `probe/` (fixed-width longs, column-
  * pruned), broadcast the BATCH's band rows against it, and aggregate
  * the collisions — batch-sized work plus one pruned index read; the
  * corpus text is never touched and no corpus-wide aggregate runs.
  * [[append]] keeps the index alive across publishes: signatures are
  * computed for the appended docs ONLY, and the derived tables are
  * rebuilt from the persisted band rows (an explode over fixed-width
  * signature rows — no text is ever re-hashed).
  *
  * Derived tables are published as GENERATIONS: each rebuild writes a
  * fresh `gen-N/` dir and then atomically replaces the marker that
  * names the current one, so a reader never observes a half-written
  * table AND an in-flight probe planned against gen-N-1 keeps its
  * files until the NEXT rebuild retires them (one generation is always
  * kept behind). A crashed [[append]] re-run is idempotent (the
  * signature append anti-joins the already-indexed doc_ids first; an
  * orphaned gen dir with no marker pointing at it is overwritten or
  * GC'd by the next rebuild).
  */
object LshIndex {

  /** Bump when the on-disk layout or the signature family changes —
    * a cached index from an older build must not be trusted. */
  private val FormatVersion = 1

  final case class Index(spark: SparkSession, path: String) {
    def signatures: DataFrame = spark.read.parquet(s"$path/signatures")
    // derived tables live under generation dirs; the marker names the
    // CURRENT one, so an append publishes a new generation atomically
    // (one marker replace) and an in-flight probe keeps reading the
    // files it planned against — the previous generation is retained
    // until the next append retires it (see [[deriveTables]])
    def keyCounts: DataFrame =
      spark.read.parquet(s"$path/gen-${currentGen(spark, path)}/keycounts")
    def probeSide: DataFrame =
      spark.read.parquet(s"$path/gen-${currentGen(spark, path)}/probe")
    def docIds: DataFrame = signatures.select(col("doc_id"))

    /** Accumulated candidate pairs ([[appendPairs]]) — the incremental
      * clustering ledger: CC over this set equals CC over a full
      * corpus recompute (every pair of docs sharing a band key is
      * transitively connected through the cycle that introduced the
      * younger doc). Empty-schema frame when no pairs were recorded. */
    def pairs: DataFrame = {
      val p = new Path(s"$path/pairs")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(p.toString)
      else spark.range(0).select(col("id").as("doc_a"), col("id").as("doc_b"))
    }
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(path: String) = new Path(s"$path/_graft_lsh_index")

  private def readMarker(spark: SparkSession, path: String): Option[String] = {
    val f = fs(spark, path)
    try {
      if (!f.exists(markerPath(path))) None
      else {
        val in = f.open(markerPath(path))
        val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        Some(txt.trim)
      }
    } catch { case _: java.io.IOException => None }
  }

  /** An index exists iff its version marker says this build wrote it. */
  def exists(spark: SparkSession, path: String): Boolean =
    readMarker(spark, path).exists(_.startsWith(marker + " gen="))

  /** The generation the marker currently points at — the unit of
    * atomic publish for the derived tables. */
  private def currentGen(spark: SparkSession, path: String): Long =
    readMarker(spark, path) match {
      case Some(m) if m.startsWith(marker + " gen=") =>
        m.stripPrefix(marker + " gen=").trim.toLong
      case other => throw new IllegalStateException(
        s"no valid LSH index marker at $path (found: $other)")
    }

  private def marker: String =
    s"v$FormatVersion k=${Dedup.K} bands=${Dedup.BANDS}"

  def load(spark: SparkSession, path: String): Index = {
    require(exists(spark, path), s"no LSH index at $path (or version mismatch)")
    Index(spark, path)
  }

  /** Build and persist an index over `docs` (doc_id, text). The one
    * full-corpus signature job — paid once per corpus snapshot. */
  def build(docs: DataFrame, path: String): Index =
    buildFromSignatures(Dedup.minhashSignatures(docs), path)

  /** Build from already-computed signatures (a caller that has the
    * signature frame in hand — e.g. curateCycle's new-batch path —
    * must not pay the text pass twice). */
  def buildFromSignatures(sig: DataFrame, path: String): Index = {
    val spark = sig.sparkSession
    val f = fs(spark, path)
    f.delete(new Path(path), true)
    sig.write.mode("overwrite").parquet(s"$path/signatures")
    deriveTables(spark, path)
    Index(spark, path)
  }

  /** Append new docs' signatures and refresh the derived tables.
    * Signature rows are computed for `newDocs` ONLY; `keycounts/` and
    * `probe/` are rebuilt from the persisted signatures (fixed-width
    * longs — no text is re-hashed, the rebuild is one band explode +
    * one aggregate over the index itself, amortized across the probes
    * that reuse it). Already-indexed doc_ids are skipped, which makes
    * a crashed-append re-run idempotent. */
  def append(index: Index, newDocs: DataFrame): Index =
    appendSignatures(index, Dedup.minhashSignatures(newDocs))

  def appendSignatures(index: Index, newSig: DataFrame): Index = {
    val spark = index.spark
    val fresh = newSig.join(index.docIds, Seq("doc_id"), "left_anti")
    fresh.write.mode("append").parquet(s"${index.path}/signatures")
    deriveTables(spark, index.path)
    index
  }

  /** Record candidate pairs found by a probe/self-join cycle into the
    * incremental clustering ledger (duplicate edges are harmless — CC
    * is idempotent to them, so a re-run cycle cannot corrupt it). */
  def appendPairs(index: Index, pairs: DataFrame): Unit =
    pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .write.mode("append").parquet(s"${index.path}/pairs")

  /** Near-dup candidates of `batch` against the indexed corpus:
    * (batch_id, corpus_id, n_shared_bands). Byte-identical results to
    * [[Dedup.incrementalLshCandidates]] on the same corpus — the
    * probe side here is the same star-capped frame, just persisted —
    * at batch-sized cost: the batch's band rows BROADCAST against one
    * column-pruned read of `probe/`, and only colliding groups reach
    * the aggregate. No corpus text scan, no corpus-wide aggregate. */
  def probe(index: Index, batch: DataFrame): DataFrame =
    probeSignatures(index, Dedup.minhashSignatures(batch))

  def probeSignatures(index: Index, batchSig: DataFrame): DataFrame = {
    val bb = Dedup.bands(batchSig)
      .select(col("doc_id").as("batch_id"), col("band"), col("k1"), col("k2"))
    index.probeSide.join(broadcast(bb), Seq("band", "k1", "k2"))
      .groupBy(col("batch_id"), col("doc_id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Rebuild `keycounts/` and `probe/` from the persisted signatures —
    * the EXACT construction of [[Dedup.incrementalLshCandidates]]'s
    * in-query probe side (cold rows ∪ hot-key anchors under the
    * catalog cap rule `bn·20·BANDS > tot AND bn > 64`), so a probe
    * against the index hashes identically to the index-free path.
    *
    * Published as a new GENERATION: tables land in a fresh `gen-N/`
    * dir, the marker is atomically replaced to point at N (FileContext
    * rename-with-OVERWRITE — rename(2) on posix, the namenode's atomic
    * rename on HDFS), and only generations ≤ N−2 are garbage-collected
    * — a probe that planned against gen N−1 keeps every file it will
    * read until the NEXT rebuild, so concurrent probe-during-append is
    * safe without any reader-side coordination. A crash before the
    * marker replace leaves an orphan gen dir (overwritten or GC'd
    * later) and a still-consistent index at N−1. */
  private def deriveTables(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val gen = readMarker(spark, path) match {
      case Some(m) if m.startsWith(marker + " gen=") =>
        m.stripPrefix(marker + " gen=").trim.toLong + 1
      case _ => 1L
    }
    val genDir = s"$path/gen-$gen"
    f.delete(new Path(genDir), true) // orphan from a crashed rebuild
    val sig = spark.read.parquet(s"$path/signatures")
    val b = Dedup.bands(sig)
    val keyCounts = b.groupBy(col("band"), col("k1"), col("k2"))
      .agg(count(lit(1)).as("bn"), min(col("doc_id")).as("anchor"))
    keyCounts.write.parquet(s"$genDir/keycounts")
    val kc = spark.read.parquet(s"$genDir/keycounts")
    val tot = kc.agg(sum(col("bn")).as("tot"))
    val hotKeys = kc.crossJoin(broadcast(tot))
      .filter(col("bn") * lit(20 * Dedup.BANDS) > col("tot") &&
        col("bn") > lit(64))
      .select(col("band"), col("k1"), col("k2"), col("anchor"))
    val cold = b.join(broadcast(hotKeys.drop("anchor")),
      Seq("band", "k1", "k2"), "left_anti")
    // key-sorted layout: parquet row-group min/max stats on the band
    // key columns line up with the probe join's key, so engines that
    // inject runtime key filters (Spark's bloom-filter join, literal
    // key probes) can skip row groups, and sorted fixed-width longs
    // compress far better — both save-time costs, paid once per
    // snapshot, never per probe
    val probeSide = cold.unionByName(
      hotKeys.select(col("band"), col("k1"), col("k2"),
        col("anchor").as("doc_id")))
      .repartitionByRange(col("band"), col("k1"), col("k2"))
      .sortWithinPartitions("band", "k1", "k2")
    probeSide.write.parquet(s"$genDir/probe")
    writeMarker(spark, path, gen)
    // retire generations no in-flight reader can still hold: anything
    // older than the one we just replaced
    try {
      f.listStatus(new Path(path)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("gen-") &&
            scala.util.Try(n.stripPrefix("gen-").toLong)
              .toOption.exists(_ <= gen - 2))
          f.delete(st.getPath, true)
      }
    } catch { case _: java.io.IOException => () } // GC is best-effort
  }

  private def writeMarker(spark: SparkSession, path: String, gen: Long): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(s"$path/_graft_lsh_index.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$marker gen=$gen".getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), f.makeQualified(markerPath(path)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Content fingerprint of a parquet table directory (file names,
    * sizes, mtimes + the index format) — the cache key for
    * [[buildOrLoad]]: any rewrite of the corpus produces a new key, so
    * a stale cached index can never answer for changed data. */
  def pathFingerprint(spark: SparkSession, tablePath: String): String = {
    val p = new Path(tablePath)
    val f = fs(spark, tablePath)
    val parts = scala.collection.mutable.ArrayBuffer(marker)
    if (f.exists(p)) {
      val it = f.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        parts += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Load the index cached for this exact corpus snapshot, or build it
    * once (the standing-index contract: signatures are computed when
    * the corpus changes, never per probe). `cacheRoot` defaults to the
    * JVM temp dir, overridable via GRAFT_LSH_CACHE for a cluster's
    * shared store. */
  def buildOrLoad(spark: SparkSession, docs: DataFrame, tablePath: String,
      cacheRoot: String = sys.env.getOrElse("GRAFT_LSH_CACHE",
        sys.props("java.io.tmpdir") + "/graft-lsh-cache")): Index =
    synchronized {
      val path = s"$cacheRoot/${pathFingerprint(spark, tablePath)}"
      if (exists(spark, path)) load(spark, path)
      else {
        // build into a private staging dir, then publish with one
        // rename: `synchronized` only serializes THIS JVM — two
        // processes racing the same cache key must not interleave
        // writes under the final path. The rename loser just loads
        // the winner's (identical) index.
        val staging = s"$cacheRoot/.build-${java.util.UUID.randomUUID()}"
        build(docs, staging)
        val f = fs(spark, cacheRoot)
        f.mkdirs(new Path(cacheRoot))
        if (f.rename(new Path(staging), new Path(path))) Index(spark, path)
        else {
          f.delete(new Path(staging), true)
          require(exists(spark, path),
            s"lost the build race for $path but no valid index appeared")
          Index(spark, path)
        }
      }
    }
}
