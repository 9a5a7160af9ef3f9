package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.{ckpt, table}

/** Pack C (dedup) — training-data deduplication operators
  * (SURVEY.md §2.C1-C5): exact hash dedup, MinHash signatures,
  * MinHash-LSH banding, exact n-gram Jaccard, SimHash.
  *
  * Everything hashes through the portable md5-derived 32-bit hash so
  * the DuckDB oracle is bit-identical (Spark's murmur3 `hash()` has no
  * DuckDB twin).
  *
  * Scale notes: signatures/fingerprints are computed scan-side in one
  * pass (shuffle only the (doc_id, signature) pairs, never the corpus);
  * LSH candidate pairs shuffle on uniform band-bucket keys (no skew by
  * construction); exact-Jaccard verification joins only candidate
  * pairs back to shingle sets.
  */
object Dedup {

  /** Base portable 32-bit hash (matches DuckDB
    * `('0x'||substr(md5(s),1,8))::BIGINT`). */
  def baseHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // Universal-hash family over the single base hash: one md5 per
  // shingle instead of K — 8x less hashing on the scan (the md5 IS the
  // minhash hot loop at corpus scale). (a*h + b) mod 2^32, a prime
  // < 2^28 so a*h stays below 2^62 (no BIGINT overflow in either
  // engine).
  private val HASH_A = Seq(15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L)
  private val HASH_B = Seq(7L, 101L, 1009L, 10007L, 100003L, 1000003L,
    10000019L, 100000007L)
  private val M32 = 4294967296L

  def seededHash(seed: Int, h: Column): Column =
    (h * lit(HASH_A(seed)) + lit(HASH_B(seed))) % lit(M32)
  private def seededHashSql(seed: Int, h: String): String =
    s"($h * ${HASH_A(seed)} + ${HASH_B(seed)}) % $M32"

  private[operators] val K = 8          // minhash signature length
  private[operators] val BANDS = 4      // LSH bands (2 rows each)

  /** documents with every 10th doc duplicated under doc_id+100000 —
    * deterministic duplicate injection so dedup operators have real
    * work to do (the synthetic corpus has no exact dups). */
  private[operators] def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
  }
  private[operators] val dupSql =
    """SELECT * FROM documents
      |UNION ALL
      |SELECT doc_id + 100000, text, lang, source, n_chars
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** 3-word shingles of a (doc_id, text) frame: one row per
    * (doc_id, shingle), duplicates kept (min-hash is
    * multiset-insensitive). Public df-level API. */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(toks)-2), i -> concat_ws(' ', slice(toks, i, 3)))"))
          .as("sh"))
  private def shingles(s: SparkSession, dir: String): DataFrame =
    shingles(table(s, dir, "documents"))
  /** Shingle CTE body over an arbitrary doc source (a table name or a
    * CTE) — shared with the composed curation oracle (q113), which
    * shingles stage-survivor CTEs rather than the raw table. */
  private[operators] def shinglesSqlFrom(src: String): String =
    s"""SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
       |FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
       |      FROM $src) t,
       |  UNNEST(generate_series(1, len(toks)-2)) AS u(i)
       |WHERE len(toks) >= 3""".stripMargin
  private val shinglesSql = shinglesSqlFrom("documents")

  /** Per-doc novelty (q134): the fraction of a doc's distinct
    * shingles that appear NOWHERE else in the corpus (df = 1) — the
    * inverse of q120's dup-mask signal, and the score a curation pass
    * uses to up-weight genuinely new material. Docs under 3 tokens
    * have no shingles and yield no row (the shingle-family
    * convention). Scale shape: shingle hashes (64+64-bit fixed keys,
    * not strings) aggregate to a df table on a uniform key; the
    * re-join fans each doc-shingle row through one hash probe and the
    * per-doc re-agg is map-side combinable — two uniform shuffles, no
    * pair join anywhere. */
  def shingleNovelty(docs: DataFrame): DataFrame = {
    val sh = shingleHashes(docs)
    val df = sh.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("df"))
    sh.join(df, Seq("h1", "h2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_sh"), 6))
  }

  /** Distinct shingle *hash* set of a (doc_id, text) frame: doc_id with
    * the two independent 32-bit halves of md5(shingle). Fixed-width
    * numeric keys — the distinct and every downstream join shuffle 16
    * bytes per shingle instead of the shingle string, which is the
    * dominant shuffle cost of exact-Jaccard verification at corpus
    * scale. 64 collision bits keep "exact" honest; a collision perturbs
    * both engines identically (same md5), so oracle parity holds.
    * Public df-level API. */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(call_function("shingle_hashes", col("text"))).as("p"))
      .distinct()
      .select(col("doc_id"),
        shiftrightunsigned(col("p"), 32).as("h1"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("h2"))

  /** NON-distinct (doc_id, h1, h2) shingle-hash stream — the shared
    * scan-side producer behind [[shingleHashes]] (which distincts on
    * the packed key first: one 8-byte key through the exchange, not
    * two longs) and [[minhashSignatures]]/Curation (min is
    * multiset-invariant, no distinct needed). r8: tokenize → 3-gram →
    * md5 → both 32-bit halves runs as ONE native pass
    * (`functions/ShingleHashes.scala`, packed `(h1 << 32) | h2`) —
    * byte-faithful to the `split → concat_ws → md5-hex → conv` chain
    * it replaced, so every DuckDB mirror is untouched. */
  def shingleHashStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(call_function("shingle_hashes", col("text"))).as("p"))
      .select(col("doc_id"),
        shiftrightunsigned(col("p"), 32).as("h1"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("h2"))
  private[operators] def shingleHashSqlFrom(shCte: String): String =
    s"""SELECT DISTINCT doc_id,
       | ('0x'||substr(md5(sh),1,8))::BIGINT AS h1,
       | ('0x'||substr(md5(sh),9,8))::BIGINT AS h2
       |FROM $shCte""".stripMargin
  private val shingleHashSql = shingleHashSqlFrom("sh")

  /** doc_id, mh0..mh7 minhash signature of a (doc_id, text) frame (one
    * md5 per shingle, K derived hashes via the universal family).
    * Public df-level API. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashFromHashes(shingleHashStream(docs).select("doc_id", "h1"))

  /** Minhash signatures from an already-hashed shingle stream
    * (`doc_id, h1`). min over the seeded family is multiset-invariant,
    * so a non-distinct stream gives the same signature — which lets a
    * caller that needs the shingle stream TWICE (Curation: LSH +
    * contamination) materialize `(doc_id, h1, h2)` once and feed both
    * consumers without re-running tokenize→shingle→md5. */
  private[operators] def minhashFromHashes(sh: DataFrame): DataFrame = {
    val aggs = (0 until K).map(j => min(seededHash(j, col("h1"))).as(s"mh$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** [[minhashFromHashes]] plus the per-doc input row count as `n_sh`
    * — rides the SAME groupBy exchange, so a verifier that needs both
    * the signature and the doc's (distinct-fed) shingle count pays one
    * aggregate over the shingle stream instead of two. Feed it the
    * DISTINCT stream ([[shingleHashes]]) when `n_sh` must mean
    * "distinct shingles" (the exact-Jaccard size term). */
  private[operators] def minhashFromHashesCounted(sh: DataFrame): DataFrame = {
    val aggs = (0 until K).map(j => min(seededHash(j, col("h1"))).as(s"mh$j")) :+
      count(lit(1)).as("n_sh")
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }
  private def signatures(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(table(s, dir, "documents"))
  private[operators] def signaturesSqlFrom(shCte: String): String = {
    val mhs = (0 until K).map(j =>
      s"MIN(${seededHashSql(j, "h")}) AS mh$j").mkString(", ")
    s"""SELECT doc_id, $mhs
       |FROM (SELECT doc_id, ('0x'||substr(md5(sh),1,8))::BIGINT AS h
       |      FROM $shCte) hs
       |GROUP BY doc_id""".stripMargin
  }
  private[operators] val signaturesSql = signaturesSqlFrom("sh")

  /** (doc_id, band, k1, k2): the banded signature for LSH bucketing.
    * Band identity is the two minhash values as numeric columns — a
    * fixed-width 20-byte shuffle key instead of a concatenated string. */
  def bands(sig: DataFrame): DataFrame = bandsKeeping(sig, Nil)

  /** [[bands]] carrying `extra` passenger columns (e.g. a per-doc
    * count) through the explode — one projection, no re-join against
    * the signature frame. */
  private[operators] def bandsKeeping(sig: DataFrame,
      extra: Seq[String]): DataFrame = {
    val bandStructs = (0 until BANDS).map { b =>
      struct(lit(b).as("band"),
        col(s"mh${2 * b}").as("k1"), col(s"mh${2 * b + 1}").as("k2"))
    }
    val keep = extra.map(col)
    sig
      .select(col("doc_id") +: keep :+
        explode(array(bandStructs: _*)).as("bs"): _*)
      .select(col("doc_id") +: keep :+ col("bs.band").as("band") :+
        col("bs.k1").as("k1") :+ col("bs.k2").as("k2"): _*)
  }
  private val ccLog = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** Iterative-lineage truncation for the clustering loops.
    * `reliable = false` uses `localCheckpoint` — fastest, but blocks
    * are pinned to the executors that computed them, so an executor
    * loss (or dynamic-allocation scale-down) mid-loop kills the job.
    * `reliable = true` writes through the RELIABLE checkpoint
    * directory (`spark.sparkContext.setCheckpointDir`, typically on
    * the cluster's shared store) — the deployment-safe mode for a real
    * cluster; the caller must have set the checkpoint dir (fail fast
    * here, not N rounds in). Results are identical either way
    * (spec-proved); only fault tolerance and per-round IO differ. */
  private def iterCheckpoint(df: DataFrame, reliable: Boolean): DataFrame =
    if (!reliable) ckpt(df) // honors spark.graft.reliableCheckpoints too
    else {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable=true needs spark.sparkContext.setCheckpointDir(...) — " +
          "set it to a shared-store path before iterative clustering")
      df.checkpoint()
    }

  /** The reliable-checkpoint files behind `df`, when `df` came out of
    * an (eager) `Dataset.checkpoint()` — i.e. its plan ROOT is the
    * `LogicalRDD` over the checkpointed RDD. Root-only on purpose: a
    * derived frame (e.g. the first-round labels, an Aggregate OVER the
    * pinned edge checkpoint) contains a LogicalRDD deeper in its tree,
    * and matching there would delete a checkpoint that later rounds
    * still read. */
  private def checkpointFilesOf(df: DataFrame): Option[org.apache.hadoop.fs.Path] =
    (df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.getCheckpointFile
      case _ => None
    }).map(new Path(_))

  /** Delete the reliable checkpoint behind a ROTATED round frame so a
    * long clustering loop does not grow the shared checkpoint dir by
    * one copy of the label/edge set PER ROUND (the driver GC's
    * `cleanCheckpoints` conf is off by default and fires late). Call
    * only after nothing reads the frame again — i.e. after the round's
    * convergence check, just before re-binding the loop variable. The
    * PINNED initial edge list and the FINAL round's checkpoint are
    * intentionally kept (the caller still consumes them); they are
    * app-teardown / `spark.cleaner.referenceTracking.cleanCheckpoints`
    * territory. No-op in localCheckpoint mode (blocks are GC-managed)
    * and on frames that were never round-checkpointed. */
  private def dropRoundCheckpoint(df: DataFrame, reliable: Boolean): Unit =
    if (reliable) checkpointFilesOf(df).foreach { p =>
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      ()
    } else df.queryExecution.logical match {
      // local mode pins each round's blocks in executor storage until
      // driver GC notices — a 30-round loop otherwise carries every
      // superseded label set in memory (the ScaleSmoke CC phase tipped
      // a 16G heap over exactly this). Same root-only contract as the
      // reliable branch: only called once nothing reads the frame.
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Rounds the most recent connectedComponents* call took to converge
    * (diagnostics for ScaleSmoke's algorithm comparison). 0 when the
    * call took the [[unionFindLabels]] small-graph fast path. */
  @volatile private[graft] var lastCcRounds: Int = 0

  /** Edge-count bar under which both CC variants solve the components
    * driver-side instead of looping distributed rounds
    * (`spark.graft.cc.localEdgeThreshold`, default 1M edges ≈ 16 MB of
    * id pairs; 0 forces the distributed loops). Same adaptive logic as
    * a broadcast-join threshold, and like it exact either way: the
    * distributed loops cost 3-5 AQE stage-jobs of fixed scheduling
    * overhead PER ROUND, which dominates end-to-end latency precisely
    * when the edge list is broadcast-class — and near-dup edge lists
    * are corpus-DUPLICATE-sized, not corpus-sized, so even large
    * corpora often fit. The bar is checked against the EXACT count of
    * the already-materialized edge checkpoint (an observe metric on
    * the checkpoint job — zero extra jobs), so the decision costs
    * nothing and the expensive upstream pair generation still runs
    * distributed exactly once. */
  private def localEdgeThreshold(spark: SparkSession): Long =
    spark.conf.get("spark.graft.cc.localEdgeThreshold", "1000000").toLong

  /** Driver-side exact union-find over a collected edge array — the
    * CC fast path (see [[localEdgeThreshold]]). Union-by-min keeps
    * every tree's root at its component MINIMUM (the shared label
    * contract of both CC variants); path-halving keeps finds near
    * amortized-constant. Duplicate and reversed edges are harmless. */
  private def unionFindLabels(spark: SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long =
      if (!parent.contains(x0)) { parent(x0) = x0; x0 }
      else {
        var x = x0
        while (parent(x) != x) {
          val p = parent(x)
          parent(x) = parent(p) // path halving
          x = parent(x)
        }
        x
      }
    edges.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = parent.keys.toArray
    nodes.map(n => (n, find(n))).toSeq.toDF("node", "label")
  }

  private def obsCount(v: Any): Long = v match {
    case null => 0L
    case x: Number => x.longValue()
  }

  /** Connected components over an undirected pair list
    * (doc_a, doc_b): every node gets the MINIMUM doc_id reachable from
    * it (the cluster id / dedup survivor). Pregel-style min-label
    * propagation: each round joins labels to edges and takes the
    * neighborhood min; rounds needed = graph diameter (near-dup
    * clusters are shallow — dups of a common source — so this is a
    * handful of uniform-key shuffles, each O(|edges|)). For deep graphs
    * use [[connectedComponentsStar]] (O(log n) rounds). Early-exits
    * when a round changes no label; if `maxIters` rounds pass without
    * convergence the returned labels may still be split across a
    * component — a warning is logged (raise `maxIters`, or switch to
    * the star variant). Public df-level API. */
  /** Min-label propagation components. Prefer [[connectedComponentsStar]]
    * for deep or hub-heavy graphs: besides needing diameter rounds,
    * the per-round edges⋈labels sort-merge join buffers every match of
    * a hub key (ScaleSmoke's 125k-degree hub OOMs a default driver
    * heap here; the star variant does not). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20,
      reliable: Boolean = false): DataFrame = {
    // Materialize the edge list ONCE: every round (and every
    // convergence check) re-reads it, and without this the whole
    // upstream pair-generation pipeline would re-execute per round.
    val obsE = new org.apache.spark.sql.Observation(
      s"graft-cc-${java.util.UUID.randomUUID()}")
    val edges = iterCheckpoint(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .observe(obsE, count(lit(1)).as("n")),
      reliable)
    // small-graph fast path: both directions were counted, so the bar
    // doubles (see localEdgeThreshold)
    if (obsCount(obsE.getAsJava.get("n")) <
        2 * localEdgeThreshold(pairs.sparkSession)) {
      val arr = edges.collect().map(r => (
        r.get(0).asInstanceOf[Number].longValue(),
        r.get(1).asInstanceOf[Number].longValue()))
      dropRoundCheckpoint(edges, reliable)
      lastCcRounds = 0
      return unionFindLabels(pairs.sparkSession, arr)
    }
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("mdst"))
      .select(col("node"), least(col("node"), col("mdst")).as("label"))
    // Labels only ever DECREASE (each round takes a min that includes
    // the node's own current label via the self-union below), so the
    // label SUM is a strictly-monotone convergence witness: unchanged
    // sum ⇔ no label moved. The per-round sum rides the round's OWN
    // checkpoint job as an `observe` metric — the old labels⋈labels
    // convergence join (an exchange + its own job tree per round
    // under AQE) costs zero extra jobs now. decimal(38,0) keeps the
    // sum exact far beyond any real node count (n·maxLong needs < 29
    // digits at n = 10^9).
    val sumExpr = sum(col("label").cast("decimal(38,0)")).as("s")
    def asSum(v: Any): java.math.BigDecimal =
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal]
    var prevSum = {
      val r = labels.agg(sumExpr).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // neighborhood min in ONE join + ONE aggregate: each node's new
      // label = min over (its own label ∪ its in-neighbors' labels).
      // The self-union replaces the old second labels-join — same
      // values (least(own, neighbor-min)), one exchange fewer per
      // round, and it also guarantees the monotonicity the sum check
      // relies on.
      val obs = new org.apache.spark.sql.Observation(
        s"graft-cc-${java.util.UUID.randomUUID()}")
      val next = iterCheckpoint(edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"))
        .observe(obs, sumExpr),
        reliable) // truncate the growing iterative lineage
      // the (local|reliable) checkpoint was the eager action, so the
      // metric is already resolved — this get never waits on a job
      val s = asSum(obs.getAsJava.get("s"))
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      dropRoundCheckpoint(labels, reliable) // round N-1 no longer read
      labels = next
      i += 1
    }
    lastCcRounds = i
    if (!converged) ccLog.warn(
      s"connectedComponents did not converge in $maxIters rounds — " +
        "labels may split components; raise maxIters or use connectedComponentsStar")
    labels
  }

  /** Connected components via alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond"): O(log n) rounds regardless of component diameter,
    * where min-label propagation needs diameter rounds. Same contract
    * as [[connectedComponents]] — (node, label) with label = component
    * minimum — and the same per-round shape (uniform-key groupBy over
    * the edge list), so it drops in wherever chains/deep graphs make
    * min-label slow. Each round strictly shrinks edge count toward the
    * star form, so later rounds get cheaper. Public df-level API. */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 50,
      reliable: Boolean = false): DataFrame = {
    // Convergence witness (r14, the r12 observe-metric reclaim applied
    // to the star variant): fixpoint = identical edge SET round over
    // round, but a full-outer set comparison is its own exchange-heavy
    // job per round under AQE. Instead (count, Σhi, Σlo) rides each
    // round's checkpoint job as observe metrics — a changed set almost
    // always moves one of the three — and only a STABLE witness pays
    // for the exact set comparison, which then either confirms the
    // fixpoint (the normal case: one confirmation job per CC call
    // instead of one per round) or, on a sum collision, sends the loop
    // around again with correctness untouched. Decimal sums stay exact
    // far beyond any real node count.
    val wCnt = count(lit(1)).as("w_n")
    def wSum(c: String) = sum(col(c).cast("decimal(38,0)")).as(s"w_$c")
    def witnessOf(obs: org.apache.spark.sql.Observation): (Any, Any, Any) = {
      val m = obs.getAsJava
      (m.get("w_n"), m.get("w_hi"), m.get("w_lo"))
    }
    val obs0 = new org.apache.spark.sql.Observation(
      s"graft-ccstar-${java.util.UUID.randomUUID()}")
    var edges = iterCheckpoint(
      pairs.select(
          greatest(col("doc_a"), col("doc_b")).as("hi"),
          least(col("doc_a"), col("doc_b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
        .observe(obs0, wCnt, wSum("hi"), wSum("lo")),
      reliable)
    var w = witnessOf(obs0)
    // small-graph fast path (see localEdgeThreshold): the count rides
    // the witness metrics already observed on the checkpoint job
    if (obsCount(w._1) < localEdgeThreshold(pairs.sparkSession)) {
      val arr = edges.collect().map(r => (
        r.get(0).asInstanceOf[Number].longValue(),
        r.get(1).asInstanceOf[Number].longValue()))
      dropRoundCheckpoint(edges, reliable)
      lastCcRounds = 0
      return unionFindLabels(pairs.sparkSession, arr)
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // large-star: every node x links its LARGER neighbors to the min
      // of its closed neighborhood (strictly-larger guard keeps the
      // step acyclic)
      val nbrs = edges.select(col("hi").as("x"), col("lo").as("y"))
        .union(edges.select(col("lo").as("x"), col("hi").as("y")))
      val lmins = nbrs.groupBy(col("x")).agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("x"), col("mn")).as("m"))
      val afterLarge = nbrs.join(lmins, "x")
        .filter(col("y") > col("x"))
        .select(col("y").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
      // small-star: every node x links its smaller neighbors (and
      // itself) to the min of those
      val smins = afterLarge.groupBy(col("hi").as("x")).agg(min(col("lo")).as("m"))
      val obs = new org.apache.spark.sql.Observation(
        s"graft-ccstar-${java.util.UUID.randomUUID()}")
      val next = iterCheckpoint(
        afterLarge.join(smins, col("hi") === col("x"))
          .select(col("lo").as("node"), col("m"))
          .union(smins.select(col("x").as("node"), col("m")))
          .filter(col("node") =!= col("m"))
          .select(col("node").as("hi"), col("m").as("lo"))
          .distinct()
          .observe(obs, wCnt, wSum("hi"), wSum("lo")),
        reliable)
      val wNext = witnessOf(obs)
      // fixpoint = identical edge set (stars centered at component
      // mins); the exact comparison runs only when the witness is
      // stable — normally exactly once, on the true fixpoint
      converged = wNext == w &&
        next.as("n").join(edges.as("o"),
            col("n.hi") === col("o.hi") && col("n.lo") === col("o.lo"),
            "full_outer")
          .filter(col("n.hi").isNull || col("o.hi").isNull).isEmpty
      w = wNext
      dropRoundCheckpoint(edges, reliable) // round N-1 no longer read
      edges = next
      i += 1
    }
    lastCcRounds = i
    if (!converged) ccLog.warn(
      s"connectedComponentsStar did not converge in $maxIters rounds — " +
        "labels may split components; raise maxIters")
    edges.select(col("hi").as("node"), col("lo").as("label"))
      .union(edges.select(col("lo").as("node"), col("lo").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
  }

  /** LSH candidate pairs of a (doc_id, text) frame: pairs sharing at
    * least one signature band, with the shared-band count. Public
    * df-level API (the q32 operator, reusable on any corpus). */
  def lshCandidates(docs: DataFrame): DataFrame =
    lshCandidatesFromSignatures(minhashSignatures(docs))

  /** The full near-dup pipeline as a pair table: LSH candidates →
    * exact shingle-set Jaccard verification (the q61 machinery,
    * public so composers — q178's per-doc kNN — reuse the verified
    * pairs). Only candidate pairs (never the corpus cross-product)
    * reach the verification join. Deliberately NOT checkpointed: the
    * shingle scan re-runs per consumer, but it is cheap per pass while
    * its materialization is enormous (every (doc, shingle-hash) row) —
    * measured 2.31 s recomputed vs 2.99 s checkpointed at sf0.1.
    * Returns (doc_a, doc_b, n_shared_bands, n_a, n_b, n_inter,
    * jaccard) with doc_a < doc_b. */
  /** Corpus self-candidate pairs for the gated per-snapshot consumers
    * (q32/q72/q77/q93/q179 and q143's near rung), served from the
    * STANDING [[LshIndex]] for this corpus snapshot: the whole LSH
    * consumer family shares ONE fingerprint-cached signature/segment
    * artifact instead of each query re-running
    * tokenize→shingle→minhash→key-count over the corpus.
    * [[LshIndex.candidatePairs]] is byte-identical to
    * [[lshCandidates]] (LshIndexSpec pins it on clean, viral and
    * grown-by-appends corpora), so every consumer's from-scratch SQL
    * oracle still hash-matches. */
  private def snapshotCandidates(s: SparkSession, dir: String): DataFrame =
    LshIndex.candidatePairs(
      LshIndex.buildOrLoad(s, table(s, dir, "documents"),
        s"$dir/documents.parquet"))

  def lshVerifiedPairs(docs: DataFrame): DataFrame = {
    // NOTE (r15, measured): ckpt'ing `cand` and `sh` here looks like
    // the q93 multi-consumer rule but is a LOSS (q61 1.77→2.07 s,
    // q178 1.86→2.08 s, +4 jobs each at sf0.1) — both subtrees end in
    // an Exchange, so ReuseExchange already shares the post-shuffle
    // work across consumers and the extra materialization jobs buy
    // nothing. Deliberately left un-ckpt'd.
    val cand = lshCandidates(docs)
    val sh = shingleHashes(docs)
    val cnts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id")
        && col("x.h1") === col("y.h1") && col("x.h2") === col("y.h2"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    cand
      .join(cnts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        col("ca.n_sh").as("n_a"), col("cb.n_sh").as("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 6))
  }

  /** Incremental LSH probe: near-dup candidate pairs between a SMALL
    * re-crawl `batch` and the STANDING `corpus` — q97's exact-dedup
    * twin for near-dups, and the re-crawl path that matters at 100 TB.
    * The batch's band table BROADCASTS; the corpus band stream is
    * probed where it is scanned, so the corpus never self-joins and
    * never shuffles its band set — only colliding (batch_id,
    * corpus_id) groups reach the aggregate, a batch-sized frame.
    * Returns (batch_id, corpus_id, n_shared_bands). */
  def incrementalLshCandidates(corpus: DataFrame,
      batch: DataFrame): DataFrame = {
    val bb = bands(minhashSignatures(batch))
      .select(col("doc_id").as("batch_id"), col("band"), col("k1"),
        col("k2"))
    // Same star-cap rule as [[lshCandidatesFromSignatures]], probe
    // flavor: a probe doc landing in an oversized CORPUS bucket (a
    // viral duplicate family) would otherwise match every member —
    // batch × bucket candidate rows. The bucket's ANCHOR alone is the
    // representative match (the q93/q141 cluster-representative
    // discipline); cold buckets are untouched, so natural corpora
    // never see the guard. ckpt the signatures (see
    // [[lshCandidatesFromSignatures]]): corpus bands feed the
    // key-count agg and the probe join (the multi-consumer rule).
    //
    // The guard is BATCH-PRICED, not corpus-priced (r9 verdict ask
    // #2): corpus band rows semi-join the broadcast batch band keys
    // BEFORE the key-count aggregate — a key the batch can't collide
    // with can never contribute a candidate, and per-key counts are
    // unchanged by dropping whole other keys, so the aggregate shrinks
    // from |corpus × BANDS| rows to the matched keys' rows. The cap
    // denominator `tot` (total corpus band rows) doesn't survive that
    // pruning, but it equals count(signatures) × BANDS by construction
    // (fixed-fanout explode) — a metadata-cheap count on the ckpt'd
    // signature frame, not a corpus-wide sum.
    val sig = ckpt(minhashSignatures(corpus))
    val cb = bands(sig)
    val bbKeys = bb.select(col("band"), col("k1"), col("k2")).distinct()
    val hit = cb.join(broadcast(bbKeys), Seq("band", "k1", "k2"),
      "left_semi")
    val keyCounts = hit.groupBy(col("band"), col("k1"), col("k2"))
      .agg(count(lit(1)).as("bn"), min(col("doc_id")).as("anchor"))
    val tot = sig.agg((count(lit(1)) * lit(BANDS)).as("tot"))
    val hotKeys = keyCounts.crossJoin(broadcast(tot))
      .filter(col("bn") * lit(20 * BANDS) > col("tot") && col("bn") > lit(64))
      .select(col("band"), col("k1"), col("k2"), col("anchor"))
    val cold = hit.join(broadcast(hotKeys.drop("anchor")),
      Seq("band", "k1", "k2"), "left_anti")
    val probeSide = cold.unionByName(
      hotKeys.select(col("band"), col("k1"), col("k2"),
        col("anchor").as("doc_id")))
    probeSide.join(broadcast(bb), Seq("band", "k1", "k2"))
      .groupBy(col("batch_id"), col("doc_id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** The q131 verification pipeline against a standing [[LshIndex]]:
    * probe candidates of `batch` vs the indexed corpus, exact-Jaccard-
    * verified ON CANDIDATES ONLY. Returns (batch_id, corpus_id,
    * n_shared_bands, n_batch, n_corpus, n_inter, jaccard), unordered
    * — q131 is this plus an orderBy; the streaming near-dup screen
    * runs it per micro-batch.
    *
    * Corpus-side cost: the index probe (one pruned read of the
    * persisted star-capped probe table — no signature recompute, no
    * corpus-wide aggregate) plus ONE candidate-pruned pass to shingle
    * hashes. The pruning has two shapes:
    *  - `pruneByIds = false` (batch gates): the corpus frame left-semi
    *    joins the broadcast candidate id set — one corpus scan,
    *    filtered before its only shuffle; right for large offline
    *    batches where the candidate set may exceed driver comfort.
    *  - `pruneByIds = true` (the per-micro-batch screen, q131):
    *    candidate corpus ids are COLLECTED — capped at 10k, the
    *    normal micro-batch regime — and pushed into the corpus scan
    *    as a literal IN predicate. Above
    *    `spark.sql.parquet.pushdown.inFilterThreshold` (default 10)
    *    Spark pushes the IN to parquet as its min/max RANGE, so
    *    row-group pruning is by id range, not exact membership — on
    *    an id-sorted corpus that still skips the untouched tails, and
    *    the Spark-side IN filter keeps results exact regardless.
    *    Beyond the cap (a batch hitting warm-but-not-hot buckets,
    *    whose fan-out is corpus- not batch-proportional) it falls
    *    back to the semi-join shape. Identical results either way.
    *
    * The batch's distinct shingle-hash set is the shared root of
    * everything batch-side (signatures via the multiset-invariant min,
    * sizes, intersection) — ckpt'd once; the candidate-corpus shingle
    * set likewise feeds two consumers (the q93 discipline; without
    * these pins the batch text tokenizes three times and the final
    * verification join re-plans file scans at probe time —
    * DedupReportPlanSpec pins both). */
  def indexProbeVerified(ix: LshIndex.Index, batch: DataFrame,
      corpus: DataFrame, pruneByIds: Boolean = false): DataFrame = {
    val shB = ckpt(shingleHashes(batch))
    // the batch's distinct-shingle count (the exact-Jaccard size term)
    // rides the minhash groupBy and the probe's collision aggregate
    // (r12): `cand` comes back with n_batch attached, so no second
    // count aggregate ever runs over the batch's shingle stream
    val cand = ckpt(LshIndex.probeSignaturesCounted(ix,
      minhashFromHashesCounted(shB.select(col("doc_id"), col("h1")))))
    // The literal-IN path's id set is NOT bounded by the star-cap
    // alone: only keys above the hot rule (bn > tot/(20·BANDS)) are
    // capped, so a batch doc landing in a warm-but-not-hot bucket can
    // fan out up to ~tot/80 candidate ids — corpus-proportional, not
    // batch-proportional. Cap the driver collect and fall back to the
    // broadcast semi-join beyond it (same answer, one corpus pass) so
    // an adversarial micro-batch can never OOM a long-running screen.
    val maxLiteralIds = 10000
    val candDocs =
      if (!pruneByIds)
        corpus.join(
          broadcast(cand.select(col("corpus_id").as("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
      else {
        val ids = cand.select(col("corpus_id")).distinct()
          .limit(maxLiteralIds + 1)
          .collect().map(_.getLong(0)).toSeq
        if (ids.isEmpty) corpus.limit(0)
        else if (ids.size > maxLiteralIds)
          corpus.join(
            broadcast(cand.select(col("corpus_id").as("doc_id")).distinct()),
            Seq("doc_id"), "left_semi")
        else corpus.filter(col("doc_id").isin(ids: _*))
      }
    val shC = ckpt(shingleHashes(candDocs))
    val cntC = shC.groupBy(col("doc_id")).agg(count(lit(1)).as("n_corpus"))
    val inter = cand
      .join(shB.select(col("doc_id").as("batch_id"), col("h1"), col("h2")),
        Seq("batch_id"))
      .join(shC.select(col("doc_id").as("corpus_id"), col("h1"), col("h2")),
        Seq("corpus_id", "h1", "h2"))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_inter"))
    cand
      .join(cntC.select(col("doc_id").as("corpus_id"), col("n_corpus")),
        "corpus_id")
      .join(inter, Seq("batch_id", "corpus_id"), "left")
      .select(col("batch_id"), col("corpus_id"), col("n_shared_bands"),
        col("n_batch"), col("n_corpus"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_batch") + col("n_corpus") - col("n_inter")), 6))
  }

  /** Candidate pairs with the STAR-EMIT guard on oversized buckets.
    *
    * MinHash band keys are uniform for DISTINCT content, but exact
    * duplicates share ALL their band keys — a viral doc duplicated m
    * times is one m-member bucket in every band, and the raw
    * self-join emits m(m-1)/2 pairs on one reducer (the q50
    * skew-quadratic shape, reachable here through plain exact dups;
    * measured by the --skew fuzz corpus: a 150-copy cluster = 11,175
    * of q32's 16,117 pairs). The q50 cure (drop the hot key) is wrong
    * for near-dup candidates — it would LOSE the corpus's biggest dup
    * cluster, the one dedup most needs. Instead, a bucket whose
    * membership exceeds the catalog cap rule (> n/20 AND > 64) emits
    * only its STAR: (anchor = min doc_id, member) pairs — linear in
    * bucket size, and connected-components downstream are PROVABLY
    * identical (the star spans exactly the members the clique did).
    * Effects of the cap, mirrored term-for-term in every consumer's
    * oracle (q32/q61/q72/q77/q93/q178/q179/q113): pair LISTS lose
    * non-anchor in-bucket pairs, n_shared_bands counts a hot band
    * only toward its anchor's pairs, densities/degrees shift — but
    * cluster membership and survivor choice never change. Buckets at
    * or below the floor are untouched (64 members = 2,016 pairs,
    * harmless on any reducer), so natural corpora (sf0.1 max bucket:
    * 10 docs, SKEW_AUDIT_r9) never see the guard engage. */
  private[operators] def lshCandidatesFromSignatures(sig: DataFrame): DataFrame = {
    // ckpt the SIGNATURES, not the banded explode: the band rows feed
    // the key-count agg, both self-join sides and the hot-star branch
    // (the q50 multi-consumer rule), but re-exploding n×K pinned rows
    // per consumer is free while pinning the n×4 band rows themselves
    // costs an extra eager job (measured +1.9 s on q113's curation
    // pipeline when this ckpt sat on bands)
    val b = bands(ckpt(sig))
    val keyCounts = b.groupBy(col("band"), col("k1"), col("k2"))
      .agg(count(lit(1)).as("bn"), min(col("doc_id")).as("anchor"))
    // n docs = tot / BANDS (fixed fanout), so the cap predicate
    // bn > n/20 evaluates in-plan off this 1-row broadcast. A hot key
    // holds > 1/20 of each band's rows, so there are PROVABLY at most
    // 20 × BANDS hot keys — broadcast class by construction, which
    // keeps the cold side a map-side anti-join and the pair self-join
    // its original single-exchange shape.
    val tot = keyCounts.agg(sum(col("bn")).as("tot"))
    val hotKeys = keyCounts.crossJoin(broadcast(tot))
      .filter(col("bn") * lit(20 * BANDS) > col("tot") && col("bn") > lit(64))
      .select(col("band"), col("k1"), col("k2"), col("anchor"))
    val cold = b.join(broadcast(hotKeys.drop("anchor")),
      Seq("band", "k1", "k2"), "left_anti")
    val coldPairs = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.k1") === col("b.k1")
          && col("a.k2") === col("b.k2")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val hotStars = b.join(broadcast(hotKeys), Seq("band", "k1", "k2"))
      .filter(col("doc_id") =!= col("anchor"))
      .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"))
    coldPairs.union(hotStars)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }
  /** Oracle mirrors of the star-capped candidate join: `bx` annotates
    * a `bands` CTE with its bucket anchor + hot flag, `cand` is the
    * star-capped pair list — string-shared by every LSH-consumer
    * oracle so they all provably mirror [[lshCandidatesFromSignatures]]. */
  private[operators] def lshBxSqlFrom(bandsCte: String): String =
    s"""SELECT b.doc_id, b.band, b.k1, b.k2, s.anchor,
       |  (s.bn * ${20 * BANDS} > t.tot AND s.bn > 64) AS hot
       |FROM $bandsCte b
       |JOIN (SELECT band, k1, k2, COUNT(*) AS bn, MIN(doc_id) AS anchor
       |      FROM $bandsCte GROUP BY 1, 2, 3) s
       |  ON b.band = s.band AND b.k1 = s.k1 AND b.k2 = s.k2
       |CROSS JOIN (SELECT COUNT(*) AS tot FROM $bandsCte) t""".stripMargin
  private[operators] val lshBxSql = lshBxSqlFrom("bands")
  private[operators] val lshCandSql =
    """SELECT doc_a, doc_b, COUNT(*) AS n_shared_bands FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bx a JOIN bx b
      |    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
      |      AND a.doc_id < b.doc_id
      |  WHERE NOT a.hot
      |  UNION ALL
      |  SELECT anchor AS doc_a, doc_id AS doc_b FROM bx
      |  WHERE hot AND doc_id <> anchor
      |) p GROUP BY 1, 2""".stripMargin
  private[operators] def bandsSqlFrom(sigCte: String): String =
    (0 until BANDS).map { b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} AS k1, mh${2 * b + 1} AS k2 FROM $sigCte"
    }.mkString("\nUNION ALL\n")
  private[operators] val bandsSql = bandsSqlFrom("sig")

  /** doc_id, simhash16, bucket: 16-bit SimHash over tokens (weight =
    * term frequency): per bit, sum +-1 by the portable hash's bit, then
    * reassemble; bucket = top 8 bits (coarse block INDEX only — simhash
    * bits are content-correlated, so prefix buckets skew; pair blocking
    * uses [[simhashPairsBanded]]'s capped band keys instead). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitAggs = (0 until 16).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val fp = (0 until 16).map(i =>
      when(col(s"b$i") > 0, 1L << i).otherwise(0L)).reduce(_ + _)
    toks.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("simhash16", fp)
      .select(col("doc_id"), col("simhash16"),
        expr("simhash16 div 256").as("bucket"))
  }
  // Queries run the one-buffer aggregate path (spec-verified equal to
  // the declarative SUM-column formulation the oracles mirror): one
  // ObjectHashAggregate with 64B/256B partial state instead of 16/64
  // separate SUM columns — ~2.5x faster on the sf0.1 bench.
  private def simhashDf(s: SparkSession, dir: String): DataFrame =
    simhashFast(table(s, dir, "documents"))

  /** Same fingerprint via the custom one-buffer TypedImperativeAggregate
    * (`simhash_agg`): one pass per token, 64-byte partial state vs 16
    * sum columns. Spec-verified equal to [[simhash]]. */
  def simhashFast(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      // native digest (Md5Hash64): hash >>> 32 IS baseHash — same
      // value, no per-token md5-hex round-trip (r14, guide §4.1)
      .withColumn("h",
        shiftrightunsigned(call_function("portable_hash64", col("tok")), 32))
      .groupBy(col("doc_id"))
      .agg(call_function("simhash_agg", col("h")).as("simhash16"))
      .withColumn("bucket", expr("simhash16 div 256"))

  /** Skew-safe simhash16 near-dup pairs (doc_a, doc_b, hamming <= 3):
    * block on 4x4-bit bands of the fingerprint (pigeonhole: a pair
    * within hamming 3 always shares >= 1 clean band) and drop
    * "stop-print" band keys held by more than 1/capDen of the corpus
    * (the q112 stop-print rule; integer-exact `keyn*capDen <= n`), so
    * no blocking key is ever quadratic in a duplicate cluster —
    * candidate mass per key is bounded by (n/capDen)^2. Recall is 1
    * for tight near-dups unless EVERY clean band of the pair is
    * stop-capped, which by construction only happens inside corpus-
    * fraction-scale duplicate clusters — exactly the pairs a dedup
    * pipeline resolves via cluster representatives (q93), not via an
    * O(cluster^2) pair list. Keys with ≤ capFloor members are always
    * kept (≤ 2,016 pairs at 64 — harmless on any reducer; without the
    * floor a corpus smaller than capDen caps every key to zero). */
  def simhashPairsBanded(shIn: DataFrame, capDen: Int = 20,
      capFloor: Int = 64): DataFrame = {
    val sh = shIn.select(col("doc_id"), col("simhash16"))
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash16"), 4 * b).bitwiseAND(15L)
          .as("bval")))
    // ckpt: the fingerprint aggregation (tokenize → explode →
    // simhash_agg over the whole corpus) feeds three consumers —
    // keyCounts, and both sides of the pair self-join; without the
    // checkpoint it re-runs per branch (the Curation.curate rule)
    val bands = ckpt(sh
      .select(col("doc_id"), col("simhash16"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("simhash16"),
        col("bs.band").as("band"), col("bs.bval").as("bval")))
    val ok = Blocking.stopCapped(bands, Seq("band", "bval"),
      fanout = 4, capDen = capDen, capFloor = capFloor)
    ok.as("a").join(ok.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(min(call_function("hamming_dist",
        col("a.simhash16"), col("b.simhash16"))).as("hamming"))
      .filter(col("hamming") <= 3)
  }

  /** Upper 32 bits of the portable hash (md5 hex chars 9-16) — together
    * with [[baseHash]] this gives 64 independent portable bits. */
  def baseHashHi(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** doc_id, simhash64, band0..band3: 64-bit SimHash (corpus-scale
    * fingerprint — 16 bits saturates at ~10^5 docs; 64 bits keeps
    * near-dup hamming gaps meaningful at 10^9+) plus 4x16-bit band
    * blocking keys. A pair within hamming distance 3 ALWAYS shares at
    * least one clean band (pigeonhole over 4 bands), so band blocking
    * has recall 1 for tight near-dups without an all-pairs pass.
    * Band keys are built from the bit votes directly (values in
    * [0, 65535]) so neither engine shifts into the sign bit. */
  def simhash64(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .withColumn("lo", baseHash(col("tok")))
      .withColumn("hi", baseHashHi(col("tok")))
    val bitAggs = (0 until 64).map { i =>
      val src = if (i < 32) shiftright(col("lo"), i)
                else shiftright(col("hi"), i - 32)
      sum(when(src.bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    // Ascending bit order: positives (bits 0-62) accumulate to at most
    // Long.MaxValue before the bit-63 term (Long.MinValue) lands, so the
    // sum never overflows under ANSI semantics in either engine.
    val fp = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    val bandCols = (0 until 4).map { b =>
      (0 until 16).map(j =>
        when(col(s"b${16 * b + j}") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"band$b")
    }
    toks.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id") +: fp.as("simhash64") +: bandCols: _*)
  }

  /** Same 64-bit fingerprint via `simhash64_agg` (one 64-counter buffer
    * instead of 64 SUM columns); bands unpacked from the fingerprint.
    * Spec-verified equal to [[simhash64]]. */
  def simhash64Fast(docs: DataFrame): DataFrame = {
    // native digest (Md5Hash64, packed (hi32(d0-3)<<32)|lo32(d4-7)):
    // simhash64_agg wants (baseHashHi<<32)|baseHash, i.e. the two
    // halves swapped — pure integer swizzle, ONE md5 per token where
    // the declarative chain digested twice and hex-parsed twice (r14)
    val ph = call_function("portable_hash64", col("tok"))
    val packed = shiftleft(ph.bitwiseAND(lit(0xFFFFFFFFL)), 32)
      .bitwiseOR(shiftrightunsigned(ph, 32))
    val withFp = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .withColumn("h", packed)
      .groupBy(col("doc_id"))
      .agg(call_function("simhash64_agg", col("h")).as("simhash64"))
    val bandCols = (0 until 4).map(b =>
      shiftrightunsigned(col("simhash64"), 16 * b).bitwiseAND(0xFFFFL)
        .as(s"band$b"))
    withFp.select(col("doc_id") +: col("simhash64") +: bandCols: _*)
  }

  /** Skew-safe simhash64 near-dup pairs (q64): block on the 4×16-bit
    * bands, but drop "stop-print" band keys held by more than
    * 1/capDen of the corpus first — the same cull as
    * [[simhashPairsBanded]], because 16-bit band VALUES are just as
    * content-derived as 4-bit ones (measured at sf0.1: the hottest
    * raw band key held 5.75% of the corpus, and that share is
    * scale-invariant, so the uncapped join is skew-quadratic at
    * 100×). `n_shared_bands` counts shared CLEAN bands. Recall: a
    * hamming ≤ 3 pair always shares ≥ 1 band (pigeonhole over 4);
    * it is lost only if every such band is stop-capped, which only
    * happens inside corpus-fraction-scale duplicate clusters —
    * q93 cluster-representative territory, not pair-list territory.
    * Keys with ≤ capFloor members are always kept (bounded pairs,
    * and tiny corpora would otherwise cap to zero candidates). */
  def simhash64PairsBanded(shIn: DataFrame, capDen: Int = 20,
      capFloor: Int = 64): DataFrame = {
    val bands = ckpt(simhash64Bands(shIn)) // one fingerprint pass for 3 consumers
    val ok = Blocking.stopCapped(bands, Seq("band", "bval"),
      fanout = 4, capDen = capDen, capFloor = capFloor)
    ok.as("a").join(ok.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"),
        min(call_function("hamming_dist",
          col("a.simhash64"), col("b.simhash64"))).as("hamming"))
      .filter(col("hamming") <= 8)
  }

  /** (doc_id, simhash64, band, bval) exploded band view for blocking. */
  private def simhash64Bands(sh: DataFrame): DataFrame = {
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"), col(s"band$b").as("bval")))
    sh.select(col("doc_id"), col("simhash64"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("simhash64"),
        col("bs.band").as("band"), col("bs.bval").as("bval"))
  }

  /** A deterministic "re-crawl" batch for q97: every 5th doc
    * re-fetched unchanged (exact corpus duplicate), every 5k+1 doc
    * re-fetched with edits (" v2" suffix — genuinely new content), and
    * the 10k+1 subset submitted TWICE under two ids (in-batch
    * duplicate). Mirrored in the oracle. */
  private[graft] def recrawlBatch(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan, not a 3-way union of filtered scans: each doc
    // emits its 0-2 re-crawl variants through a conditional explode
    // (null array slots dropped post-explode). Same multiset as the
    // oracle's UNION ALL; at 100 TB this is one pass over the corpus
    // instead of three.
    val d = table(s, dir, "documents")
    d.select(explode(array(
        when(col("doc_id") % 5 === 0, struct(
          (col("doc_id") + 200000L).as("doc_id"), col("text").as("text"))),
        when(col("doc_id") % 5 === 1, struct(
          (col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text"))),
        when(col("doc_id") % 10 === 1, struct(
          (col("doc_id") + 300000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text"))))).as("v"))
      .filter(col("v").isNotNull)
      .select(col("v.doc_id").as("doc_id"), col("v.text").as("text"))
  }
  private val recrawlSql =
    """SELECT doc_id + 200000 AS doc_id, text FROM documents
      |WHERE doc_id % 5 = 0
      |UNION ALL
      |SELECT doc_id + 200000, text || ' v2' FROM documents
      |WHERE doc_id % 5 = 1
      |UNION ALL
      |SELECT doc_id + 300000, text || ' v2' FROM documents
      |WHERE doc_id % 10 = 1""".stripMargin

  /** Blocked edit-distance near-dup pairs (SURVEY.md §2.C57): docs in
    * the same prefix block whose `pfxLen`-char prefixes are within
    * `maxDist` Levenshtein edits. Complements the shingle family —
    * Levenshtein catches small in-place edits (typo-class dups) that
    * shift every downstream shingle, and is the metric record-linkage
    * pipelines specify directly. Blocking is what makes it scale:
    * candidates only ever pair INSIDE a block, and blocks larger than
    * `maxBlock` are dropped whole (the q112 stop-print pattern —
    * boilerplate prefixes would otherwise go quadratic; dropped blocks
    * are exactly the pairs prefix-editing can't distinguish anyway).
    * The per-pair cost is bounded: Levenshtein on fixed-length
    * prefixes, O(pfxLen²) each, never whole-document. */
  def editDistancePairs(docs: DataFrame, blockLen: Int = 8,
      pfxLen: Int = 60, maxDist: Int = 15,
      maxBlock: Int = 1000): DataFrame = {
    val p = docs.select(col("doc_id"),
      substring(col("text"), 1, blockLen).as("blk"),
      substring(col("text"), 1, pfxLen).as("pfx"))
    val ok = p.groupBy(col("blk")).agg(count(lit(1)).as("bs"))
      .filter(col("bs") <= maxBlock).select(col("blk"))
    // Explicit co-partition on the join key BEFORE the pair join (r14,
    // guide §2.5/§2.6): the banded-Levenshtein pair stage is COMPUTE-
    // dense, not byte-dense — a broadcast self-join would run it at
    // the SCAN's parallelism (locally: one parquet file = one task
    // doing every DP), and AQE sizes partitions by bytes so it cannot
    // see the density. Hashing the ~60-char prefix rows across
    // defaultParallelism tasks is a KB-scale shuffle that buys a
    // core-count speedup here and is exactly the co-partitioning a
    // sort-merge/shuffled-hash join would need at corpus scale anyway
    // (the explicit partition count keeps AQE from byte-coalescing the
    // compute back onto one core). Pair set and lev values unchanged.
    val pc = p.join(ok, Seq("blk"), "left_semi")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("blk"))
    // THRESHOLDED levenshtein: the 3-arg form runs the banded
    // O(maxDist·pfxLen) algorithm with early exit and returns -1 over
    // the threshold — result-identical to computing the full distance
    // and filtering, at ~pfxLen/maxDist the work on far pairs (which
    // dominate inside blocks). The oracle keeps the plain 2-arg form —
    // same surviving pairs, same lev values.
    pc.as("a").join(pc.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.pfx"), col("b.pfx"), maxDist).as("lev"))
      .filter(col("lev") =!= -1)
  }

  /** The blocks [[editDistancePairs]] drops whole under the same
    * parameters — (blk, bs) for every block over `maxBlock`. The
    * no-silent-caps audit face: a coverage cap that can discard a
    * boilerplate-heavy corpus slice must be observable, so pipelines
    * run this alongside q119 and alert/log when `count() > 0` (the
    * frame is ≤ distinct-prefix-sized — metadata, not data). Kept as a
    * separate lazy frame rather than an eager count inside
    * [[editDistancePairs]] so the pair query itself stays one job. */
  def editDistanceDroppedBlocks(docs: DataFrame, blockLen: Int = 8,
      maxBlock: Int = 1000): DataFrame =
    docs.select(substring(col("text"), 1, blockLen).as("blk"))
      .groupBy(col("blk")).agg(count(lit(1)).as("bs"))
      .filter(col("bs") > maxBlock)

  // --- Content-defined window family (SURVEY.md §2.C58/C59) ----------
  // Fixed-STRIDE substring windows (the naive exact-substring-dedup
  // cut) miss every duplicate whose copy is shifted by ≠0 mod stride —
  // an embedded quote realigns nothing. Content-DEFINED anchors fix
  // that: a window starts wherever its own content hashes into the
  // anchor class (h1 % 16 == 0, density 1/16), so a copied
  // span reproduces the SAME interior anchors no matter what surrounds
  // it — the CDC idea (Muthitacharoen et al., LBFS) applied to corpus
  // dedup, and the alignment-robust stand-in for the suffix-array pass
  // of Lee et al. 2022's exact substring dedup.

  /** Distinct content-defined `win`-codepoint window hashes per doc:
    * one row (doc_id, h) per anchored window, where h packs two
    * independent 31-bit polynomial hashes — one fixed-width 8-byte
    * join/distinct key (62 honest collision bits, the
    * [[shingleHashes]] convention) so the distinct and every
    * downstream join shuffle a long per window, not a hash string.
    *
    * Cost shape: the [[graft.functions.CdcWindowHashes]] expression
    * ROLLS both hashes across the text — 4 multiply/mod per position,
    * no per-position allocation (rounds ≤7 digested md5 per position;
    * q120/q121 were the suite's two slowest queries, ~6 s each at
    * sf0.1). The same arithmetic is a verbatim list_reduce in the
    * DuckDB mirror, so the gate stays hash-exact where an md5-free
    * rolling scheme would normally force a rows-only check. Docs
    * shorter than `win` yield no rows. */
  def anchoredWindows(docs: DataFrame, win: Int = 50): DataFrame =
    docs.filter(length(col("text")) >= win)
      .select(col("doc_id"),
        explode(call_function("cdc_window_hashes", col("text"), lit(win)))
          .as("h"))
      .distinct()

  /** Per-doc duplicated-span mask stats (q120): of a doc's anchored
    * windows, how many occur in at least one OTHER doc (or twice in
    * this corpus — `aw` is per-doc distinct, so the window count IS
    * the doc count). The per-doc dup fraction is the removal signal
    * exact substring dedup acts on. Scale shape: window stream is
    * ~len/16 rows per doc; one uniform-key groupBy finds dup windows,
    * one left-semi prunes the stream back to them, one per-doc count —
    * never a pair join, never all-pairs. */
  def dupSpanMask(corpus: DataFrame, win: Int = 50): DataFrame = {
    val aw = anchoredWindows(corpus, win)
    val dup = aw.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val perDoc = aw.join(dup, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    val counts = aw.groupBy(col("doc_id")).agg(count(lit(1)).as("n_aw"))
    corpus.select(col("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_aw"), lit(0L)).as("n_aw"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac", when(col("n_aw") > 0,
        round(col("n_dup").cast("double") / col("n_aw"), 6)))
  }

  /** Containment pairs (q121): pairs of docs sharing anchored windows,
    * scored by |A∩B| / min(|A|,|B|) over the window sets — the
    * ASYMMETRIC overlap Jaccard misses: a short doc quoted whole
    * inside a long one has tiny Jaccard but containment ≈ 1. Blocking
    * is the shared-window inverted index itself; windows in more than
    * `maxDocFreq` docs are dropped whole (the q112 stop-print cull —
    * boilerplate spans would otherwise pair everything with
    * everything), so every join bucket is ≤ maxDocFreq and the pair
    * volume is bounded by Σ_window df² over rare windows only.
    * Containment is computed over the culled-window universe,
    * consistently for numerator and denominators. */
  def containmentPairs(corpus: DataFrame, win: Int = 50,
      maxDocFreq: Int = 50, minContain: Double = 0.5): DataFrame =
    containmentPairsFromWindows(anchoredWindows(corpus, win),
      maxDocFreq, minContain)

  /** [[containmentPairs]] over a pre-computed per-doc-distinct
    * (doc_id, h) window frame (e.g. [[anchoredWindows]], or
    * [[windowHits]]`.select(doc_id, h).distinct()`). */
  def containmentPairsFromWindows(aw: DataFrame,
      maxDocFreq: Int = 50, minContain: Double = 0.5): DataFrame = {
    val keep = aw.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= maxDocFreq).select(col("h"))
    val awk = aw.join(keep, Seq("h"), "left_semi")
    val sz = awk.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    awk.as("a").join(awk.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("containment", round(col("n_shared").cast("double")
        / least(col("n_a"), col("n_b")), 6))
      .filter(col("containment") >= minContain)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_shared"), col("containment"))
  }

  /** Maximal duplicated-span merge (q130): the removal ACTION on top
    * of q120's signal. Duplicated anchored windows are carried WITH
    * their positions (`cdc_window_hits`) and coalesced into maximal
    * masked character ranges per doc — overlapping-or-adjacent
    * intervals merge via the gaps-and-islands pattern (running max of
    * span ends over a per-doc window; a new island starts where a
    * window clears the previous maximum by >1). This is what exact
    * substring dedup actually DOES to a doc: cut these ranges, keep
    * the rest. Scale shape: same bounded window stream as q120 (one
    * uniform-key groupBy for the dup set, one left-semi back), then
    * per-DOC windows only — partitioned on doc_id, each partition
    * ≤ len/16 rows, never corpus-global ordering. */
  def dupSpans(corpus: DataFrame, win: Int = 50): DataFrame =
    dupSpansFromHits(corpus, windowHits(corpus, win), win)

  /** Position-carrying anchored-window stream (doc_id, pos, h) — the
    * shared input of [[dupSpansFromHits]] and (via doc-distinct h)
    * [[containmentPairsFromWindows]]: `cdc_window_hits` rolls the SAME
    * two polynomial hashes as `cdc_window_hashes` and packs them
    * identically, so one pass serves both the span and containment
    * faces (q143 ckpts it once instead of rolling the corpus twice). */
  def windowHits(corpus: DataFrame, win: Int = 50): DataFrame =
    corpus.filter(length(col("text")) >= win)
      .select(col("doc_id"),
        explode(call_function("cdc_window_hits", col("text"), lit(win)))
          .as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.h").as("h"))

  /** Gaps-and-islands merge of per-doc (pos, e) window intervals into
    * maximal disjoint spans (doc_id, island, s, e): a running max of
    * span ends over a per-doc window; a new island starts where a
    * window clears the previous maximum by >1. Shared by the span
    * REPORT ([[dupSpansFromHits]]) and the span TRIM ([[trimDupSpans]])
    * so the adjacency rule lives in exactly one place. Per-DOC windows
    * only — each partition ≤ len/16 rows, never corpus-global order. */
  private def mergeSpans(ivals: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    ivals
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("new_isl",
        when(col("pmax").isNull || col("pos") > col("pmax") + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_isl")).over(wOrd))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("e"))
  }

  /** [[dupSpans]] over a pre-computed [[windowHits]] frame. */
  def dupSpansFromHits(corpus: DataFrame, hits: DataFrame,
      win: Int = 50): DataFrame = {
    val dup = hits.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val dh = hits.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"),
        (col("pos") + lit(win - 1)).as("e"))
    val spans = mergeSpans(dh)
    val agg = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("masked"))
    corpus.select(col("doc_id"), length(col("text")).as("len"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("masked"), lit(0L)).cast("long").as("masked_chars"),
        // try_divide: a zero-length doc has len = 0 and masked_frac
        // NULL (DuckDB x/0 semantics), not an ANSI crash.
        round(try_divide(
          coalesce(col("masked"), lit(0L)).cast("double"), col("len")), 6)
          .as("masked_frac"))
  }

  /** Exact-substring TRIM — the REMOVAL ACTION of Lee et al.-style
    * substring dedup (q120 is the signal, q130 the span plan; this
    * actually cuts): each duplicated anchored window keeps its
    * CANONICAL occurrence (the min-doc_id holder keeps its text
    * intact) and is excised from every other doc, with overlapping
    * windows merged into maximal spans first (q130's gaps-and-islands
    * merge). Returns the corpus columns plus `text_trimmed` (the doc
    * with masked spans cut out), `n_spans`, `masked_chars` — docs with
    * no duplicated spans pass through untouched.
    *
    * Scale shape: exactly q130's plan (bounded ~len/16 window stream,
    * one uniform-key groupBy for the dup set + canonical holder, one
    * join back, per-DOC windows for the island merge) plus one
    * codegen'd `aggregate` HOF that rebuilds each trimmed doc from its
    * kept segments scan-side — no shuffle beyond q130's, and the only
    * extra state per doc is its span array (≤ len/16 entries). */
  def trimDupSpans(corpus: DataFrame, win: Int = 50): DataFrame = {
    val hits = windowHits(corpus, win)
    val dup = hits.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h"))
      .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("canon"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("canon"))
    val masked = hits.join(dup, Seq("h"))
      .filter(col("doc_id") =!= col("canon"))
      .select(col("doc_id"), col("pos"), (col("pos") + lit(win - 1)).as("e"))
    val perDoc = mergeSpans(masked).groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("masked_chars"))
    corpus.join(perDoc, Seq("doc_id"), "left")
      .withColumn("text_trimmed",
        when(col("__spans").isNull, col("text")).otherwise(expr(
          """aggregate(__spans,
            |  named_struct('last', 0, 'acc', ''),
            |  (st, sp) -> named_struct(
            |    'last', sp.e,
            |    'acc', concat(st.acc,
            |      substring(text, st.last + 1, sp.s - st.last - 1))),
            |  st -> concat(st.acc, substring(text, st.last + 1)))"""
            .stripMargin)))
      .drop("__spans")
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .withColumn("masked_chars", coalesce(col("masked_chars"), lit(0L)))
  }

  /** The q120/q121 test corpus: the base table plus exact re-posts
    * (every 10th doc verbatim) and embedded quotes (every 7th doc
    * wrapped in boilerplate — the ALIGNMENT-SHIFTED case stride
    * windows cannot catch). Mirrored in the oracle. */
  private def cdcCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 400000L).as("doc_id"),
          concat(lit("QUOTED PASSAGE FOLLOWS "), col("text"),
            lit(" END OF QUOTED PASSAGE COMMENTARY TRAILS HERE."))
            .as("text")))
  }
  private val cdcCorpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
      |UNION ALL
      |SELECT doc_id + 400000,
      |  'QUOTED PASSAGE FOLLOWS ' || text ||
      |  ' END OF QUOTED PASSAGE COMMENTARY TRAILS HERE.'
      |FROM documents WHERE doc_id % 7 = 3""".stripMargin
  // The rolling-hash mirror: the same two polynomial hashes
  // CdcWindowHashes rolls, here as per-window list_reduce folds over
  // the codepoint array (the oracle can afford O(win) per position;
  // identical arithmetic mod 2^31-1, identical (h1<<31)|h2 packing).
  private val awSql =
    """SELECT DISTINCT doc_id, h1 * 2147483648 + h2 AS h
      |FROM (
      |  SELECT doc_id,
      |    list_reduce(cp[i:i+49], (a, c) -> (a * 257 + c) % 2147483647) AS h1,
      |    list_reduce(cp[i:i+49], (a, c) -> (a * 263 + c) % 2147483647) AS h2
      |  FROM (
      |    SELECT doc_id,
      |      list_transform(string_split(text, ''),
      |        c -> CAST(unicode(c) AS BIGINT)) AS cp,
      |      length(text) AS n
      |    FROM corpus WHERE length(text) >= 50) cps,
      |  UNNEST(generate_series(1, n - 49)) AS u(i)) hashes
      |WHERE h1 % 16 = 0""".stripMargin

  // awSql's position-carrying twin (cdc_window_hits): pos survives to
  // the span-merge layer, no DISTINCT (positions are unique).
  private val awHitsSql =
    """SELECT doc_id, i AS pos, h1 * 2147483648 + h2 AS h
      |FROM (
      |  SELECT doc_id, i,
      |    list_reduce(cp[i:i+49], (a, c) -> (a * 257 + c) % 2147483647) AS h1,
      |    list_reduce(cp[i:i+49], (a, c) -> (a * 263 + c) % 2147483647) AS h2
      |  FROM (
      |    SELECT doc_id,
      |      list_transform(string_split(text, ''),
      |        c -> CAST(unicode(c) AS BIGINT)) AS cp,
      |      length(text) AS n
      |    FROM corpus WHERE length(text) >= 50) cps,
      |  UNNEST(generate_series(1, n - 49)) AS u(i)) hashes
      |WHERE h1 % 16 = 0""".stripMargin

  /** The q121 containment-pairs oracle, shared verbatim with the q143
    * dedup-impact report (the report's containment row provably
    * counts the gated pairs). */
  private val containmentPairsSql =
    s"""WITH corpus AS ($cdcCorpusSql),
       |aw AS ($awSql),
       |keep AS (SELECT h FROM aw GROUP BY h HAVING COUNT(*) <= 50),
       |awk AS (SELECT aw.* FROM aw JOIN keep USING (h)),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM awk GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |  FROM awk a JOIN awk b
       |    ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT s.doc_a, s.doc_b,
       |  CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
       |  CAST(s.n_shared AS BIGINT) AS n_shared,
       |  ROUND(s.n_shared * 1.0 / LEAST(za.n, zb.n), 6) AS containment
       |FROM shared s
       |JOIN sz za ON za.doc_id = s.doc_a
       |JOIN sz zb ON zb.doc_id = s.doc_b
       |WHERE ROUND(s.n_shared * 1.0 / LEAST(za.n, zb.n), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Keep-BEST exact dedup: one survivor per `content` group, chosen
    * by an explicit preference order (`better`, e.g. quality DESC then
    * recency DESC) rather than q30's min-id convention — the curation
    * form of exact dedup, where the duplicate family should keep its
    * highest-quality / freshest copy, not its first-seen one. Callers
    * end `better` with a unique tiebreak column so the survivor is
    * deterministic. Scale shape: identical to q30 — one uniform-key
    * shuffle on the content hash; groups are duplicate families
    * (small), so the per-group window sort is bounded. */
  def keepBest(df: DataFrame, content: Column,
      better: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(content).orderBy(better: _*)
    df.withColumn("_kb_rk", row_number().over(w))
      .filter(col("_kb_rk") === 1).drop("_kb_rk")
  }

  /** Pairwise corpus-overlap matrix between sources (q149): each
    * source's distinct-shingle set is sketched by its bottom-`k`
    * shingle hashes (a KMV sketch), and each source PAIR's Jaccard is
    * estimated by the standard bottom-k union trick —
    * |bottomk(A∪B) ∩ A ∩ B| / |bottomk(A∪B)| — the "which sources
    * duplicate each other" report a multi-crawl ingest publishes
    * before mixing (q136/q71 decide weights; this says what overlaps).
    *
    * Scale shape: ONE corpus scan → distinct on the uniform
    * (source, hash32) key → per-source bottom-k window (the sort is
    * per-source over DISTINCT hashes; at extreme skew swap for a
    * bounded KMV aggregate like q115's) → the pair join runs over
    * |sources| k-length signatures, i.e. KB-sized both sides (a
    * broadcast nested-loop on source< — |S|²/2 pairs of arrays, never
    * touching the corpus again). Estimates are integer-count /
    * integer-count — exact cross-engine parity despite being an
    * approximate sketch. */
  def sourceOverlap(docs: DataFrame, k: Int): DataFrame = {
    val sh = docs.select(col("source"),
        explode(call_function("shingle_hashes", col("text"))).as("p"))
      .select(col("source"), shiftrightunsigned(col("p"), 32).as("h"))
      .distinct()
    // KMV signature = the k SMALLEST hashes per source. The bounded
    // heap moves ≤ k rows per (source, partition) across the
    // exchange; a source-partitioned window would shuffle the whole
    // distinct shingle mass of a hot source onto one reducer.
    val sig = TopK.groupTopK(sh, Seq("source"), Seq(("h", false)), k)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("h"))).as("sig"))
    val a = sig.select(col("source").as("src_a"), col("sig").as("sig_a"))
    val b = sig.select(col("source").as("src_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("un",
        slice(array_sort(array_union(col("sig_a"), col("sig_b"))), 1, k))
      .withColumn("inter_k", size(filter(col("un"),
        x => array_contains(col("sig_a"), x) &&
          array_contains(col("sig_b"), x))))
      .select(col("src_a"), col("src_b"),
        col("inter_k").cast("long").as("inter_k"),
        round(col("inter_k").cast("double") / size(col("un")), 6)
          .as("est_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_keep_best" -> ((s, dir) => {
      // Keep-best twin of q30 on the same duplicated corpus: prefer
      // the LONGEST copy, tie → NEWEST (max doc_id — the re-crawl) —
      // where q30 keeps min doc_id unconditionally, so every duplicate
      // family provably picks the other survivor here. Output carries
      // the family size so the gate sees both the choice and the
      // grouping.
      val d = docsWithDups(s, dir).withColumn("text_hash", md5(col("text")))
      val fam = d.groupBy(col("text_hash")).agg(count(lit(1)).as("n_copies"))
      // <=> join: NULL-text docs hash to a NULL family (both engines
      // group NULLs in window partitioning); a plain equi-join would
      // silently drop that family's survivor (oracle keeps it).
      keepBest(d, col("text_hash"),
        Seq(col("n_chars").desc, col("doc_id").desc)).as("k")
        .join(fam.as("f"), col("k.text_hash") <=> col("f.text_hash"))
        .select(col("k.text_hash"), col("k.doc_id").as("keep_id"),
          col("k.n_chars"), col("f.n_copies"))
        .orderBy(col("text_hash"))
    }),

    "q120_dup_span_mask" -> ((s, dir) => {
      dupSpanMask(cdcCorpus(s, dir))
        .select(col("doc_id"), col("n_aw"), col("n_dup"), col("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    "q121_containment" -> ((s, dir) => {
      containmentPairs(cdcCorpus(s, dir))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
          col("n_shared"), col("containment"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q181_novelty_trend" -> ((s, dir) => {
      // Crawl-saturation diagnostic: mean shingle novelty (q134's
      // gated score) by doc_id DECILE — doc_id proxies crawl order, so
      // a declining profile means each marginal batch contributes less
      // new material (stop crawling this source; re-allocate budget).
      // Decile = ntile over doc_id (deterministic), mean novelty
      // summed exactly in decimal.
      // The decile is a GLOBAL per-doc rank over doc_id — an
      // unpartitioned ntile window is a one-reducer corpus sort at
      // scale, so rank via ShardedCum + arithmetic bucket instead.
      // r15 (guide §1.2/§2.4): the per-doc novelty frame is ckpt'd ONCE
      // — the old plan re-ran the whole two-shuffle novelty pipeline
      // THREE times (range-sampling pass, shard ckpt, and the nTot
      // count agg) — and the rank runs through the sampling-free
      // cumSumsBucketed with an id-range bucket: one 1-row stats job
      // replaces the range-sampling job + shard-pinning ckpt. Bucket
      // width (id span)/4096 bounds per-bucket volume by the span/4096
      // id slots (ids are unique) and keeps the offsets table ≤4097
      // rows — broadcast class at any corpus size. The 1-row collect
      // is a scalar, not a data pull (the HITS-normalizer precedent).
      val nv = graft.GraftSession.ckpt(
        shingleNovelty(table(s, dir, "documents"))
          .select(col("doc_id"), col("novelty")))
      val stats = nv.agg(count(lit(1)), min(col("doc_id")),
        max(col("doc_id"))).head()
      val nDocs = stats.getLong(0)
      val w = if (nDocs == 0L) 1L
        else math.max(1L, (stats.getLong(2) - stats.getLong(1) + 1L) / 4096L)
      ShardedCum.cumSumsBucketed(nv, Nil, Seq(col("doc_id")),
          expr(s"doc_id div $w"), Seq((lit(1L), "_rn")))
        .withColumn("_n", lit(nDocs))
        .withColumn("decile", ShardedCum.ntileFromRank("_rn", "_n", 10))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("novelty").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("mean_novelty"))
        .orderBy(col("decile"))
    }),

    "q134_shingle_novelty" -> ((s, dir) =>
      shingleNovelty(table(s, dir, "documents")).orderBy(col("doc_id"))),

    "q149_source_overlap" -> ((s, dir) =>
      sourceOverlap(table(s, dir, "documents"), k = 128)),

    "q143_dedup_report" -> ((s, dir) => {
      // The dedup-impact dashboard: ONE row per family — exact,
      // near-dup (LSH+CC), duplicated-span, containment, semantic —
      // each aggregated from the SAME machinery its own gate checks
      // (the oracle string-shares those queries' SQL), over each
      // family's gated corpus view. The per-snapshot report a curation
      // run publishes: what fraction of the corpus would each rung
      // remove/trim/flag. Scale: five aggregates of already-bounded
      // pipelines; every row's payload is one count pair.
      val docs = table(s, dir, "documents")
      val exact = docsWithDups(s, dir)
        .groupBy(md5(col("text")).as("th")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_universe"),
          (sum(col("n")) - count(lit(1))).as("n_affected"))
        .select(lit("exact").as("method"), col("n_universe"),
          col("n_affected"), lit("drop").as("action"))
      val nDocs = docs.agg(count(lit(1)).as("n_universe"))
      val cdc = cdcCorpus(s, dir)
      val cdcN = cdc.agg(count(lit(1)).as("n_universe"))
      // r14 (guide §2.6 — overlap independent jobs): the three rungs
      // with EAGER construction steps — the near-dup rung (index load +
      // CC over its candidate pairs), the CDC rolling-hash checkpoint,
      // and the semantic rung (RHP ckpt + CC inside semDedup) — are
      // mutually independent, but ran strictly serially because the
      // builder called them serially (JobProfile: 48 jobs, >half the
      // wall in construction). They now build concurrently; each
      // rung's frames are identical, so the report's bytes are too.
      //
      // near-dup rung off the STANDING LshIndex for this corpus
      // snapshot (r10): the report is a per-snapshot artifact, so its
      // signatures are by definition the index's. r12: candidates come
      // from [[LshIndex.candidatePairs]] — the persisted band segments
      // + the manifest's exact hot list — which skips the signature
      // checkpoint, the corpus-wide key-count aggregate and (on a
      // hot-free corpus) the whole star-cap branch; byte-identical
      // pairs by the warm-list induction (LshIndexSpec pins it), so
      // the SQL oracle's from-scratch recompute still hash-matches.
      // ONE rolling-hash pass over the CDC corpus feeds both the span
      // and containment rungs (cdc_window_hits packs the identical
      // hash cdc_window_hashes would; r9 — previously each rung
      // re-rolled the full corpus)
      val (nearLabels, hits, semClusters) = graft.GraftSession.par3(
        connectedComponents(
          LshIndex.candidatePairs(
            LshIndex.buildOrLoad(s, docs, s"$dir/documents.parquet"))
            .select(col("doc_a"), col("doc_b"))),
        ckpt(windowHits(cdc)),
        Similarity.semDedup(table(s, dir, "embeddings")))
      val near = nearLabels
        .agg(count(lit(1)).as("nodes"),
          countDistinct(col("label")).as("labels"))
        .crossJoin(nDocs)
        .select(lit("near_dup").as("method"), col("n_universe"),
          (col("nodes") - col("labels")).as("n_affected"),
          lit("drop").as("action"))
      val span = dupSpansFromHits(cdc, hits)
        .agg(coalesce(sum(when(col("masked_chars") > 0, 1L).otherwise(0L)),
          lit(0L)).as("n_affected")) // 0, not NULL, on an empty CDC band
        .crossJoin(cdcN)
        .select(lit("dup_span").as("method"), col("n_universe"),
          col("n_affected"), lit("trim").as("action"))
      // both pair endpoints in ONE pass (explode, not a self-union) —
      // the pair frame then has a single consumer, so it needs no ckpt
      // job and the report sheds an eager stage (r10; distinct of the
      // exploded endpoints == distinct of the two-select union)
      val cont = containmentPairsFromWindows(
          hits.select(col("doc_id"), col("h")).distinct())
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
        .agg(count(lit(1)).as("n_affected"))
        .crossJoin(cdcN)
        .select(lit("containment").as("method"), col("n_universe"),
          col("n_affected"), lit("review").as("action"))
      val sem = semClusters
        .agg(sum(col("n_members")).as("n_universe"),
          sum(col("n_dropped")).as("n_affected"))
        .select(lit("semantic").as("method"), col("n_universe"),
          col("n_affected"), lit("drop").as("action"))
      // try_divide: an empty corpus (or empty CDC band) has
      // n_universe 0/NULL and DuckDB's /0 yields a NULL rate — ANSI
      // Spark would abort the whole report (empty-corpus fuzz find)
      exact.unionByName(near).unionByName(span).unionByName(cont)
        .unionByName(sem)
        .withColumn("rate", round(
          try_divide(col("n_affected").cast("double"), col("n_universe")), 6))
        .select(col("method"), col("n_universe"), col("n_affected"),
          col("rate"), col("action"))
        .orderBy(col("method"))
    }),

    "q130_dup_span_merge" -> ((s, dir) => {
      dupSpans(cdcCorpus(s, dir))
        .select(col("doc_id"), col("n_spans"), col("masked_chars"),
          col("masked_frac"))
        .orderBy(col("doc_id"))
    }),

    "q131_incremental_lsh" -> ((s, dir) => {
      // Incremental near-dup: the q97 re-crawl batch LSH-probed
      // against the standing corpus, then exact-Jaccard-verified on
      // candidates only (the q61 verification stage, batch-vs-corpus).
      // Corpus-side cost: ONE scan to bands (probed by the broadcast
      // batch bands) + ONE candidate-pruned scan to shingle hashes
      // (left-semi against the broadcast candidate id set before its
      // only shuffle) — the corpus never self-joins at any stage.
      // Candidate list is multi-consumed (verify join + sizes + final)
      // → checkpointed once, the q93 discipline.
      //
      // The probe runs against the STANDING LshIndex for this corpus
      // snapshot (r10, verdict ask #1): signatures + the star-capped
      // probe table are built ONCE per snapshot (fingerprint-keyed
      // cache) and every subsequent probe is batch-sized work + one
      // pruned index read — no corpus signature job, no corpus-wide
      // aggregate. Byte-identical candidates to the index-free
      // incrementalLshCandidates path (same probe-side construction,
      // persisted).
      val corpus = table(s, dir, "documents")
      val batch = recrawlBatch(s, dir)
      val ix = LshIndex.buildOrLoad(s, corpus, s"$dir/documents.parquet")
      // the verification body is shared with the live per-micro-batch
      // screen (Curation.screenNearDups) — one code path for both
      // faces. pruneByIds: the candidate id set is micro-batch-sized
      // here, so the literal-IN path row-group-prunes the corpus scan
      // (with the capped collect's semi-join fallback guarding the
      // adversarial fan-out case — identical results either way)
      indexProbeVerified(ix, batch, corpus, pruneByIds = true)
        .orderBy(col("batch_id"), col("corpus_id"))
    }),

    "q119_edit_distance_pairs" -> ((s, dir) => {
      editDistancePairs(table(s, dir, "documents"))
        .select(col("doc_a"), col("doc_b"), col("lev").cast("long").as("lev"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q97_incremental_dedup" -> ((s, dir) => {
      // Incremental (snapshot) dedup: a small re-crawl batch against
      // the standing corpus. The 100 TB shape: the BATCH's hash set is
      // broadcast and the corpus is left-semi pruned SCAN-SIDE — the
      // corpus never shuffles and never builds a join table; only
      // corpus hashes that actually collide with the batch (≈ batch-
      // sized) survive the scan. In-batch duplicates then resolve by
      // min doc_id with a window over the small batch alone.
      val nb = recrawlBatch(s, dir).withColumn("text_hash", md5(col("text")))
      val corpusHits = table(s, dir, "documents")
        .select(md5(col("text")).as("text_hash"))
        .join(broadcast(nb.select(col("text_hash")).distinct()),
          Seq("text_hash"), "left_semi")
        .distinct()
      val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
      nb.join(broadcast(corpusHits.withColumn("in_corpus", lit(1))),
          Seq("text_hash"), "left")
        .withColumn("rk", row_number().over(w))
        .withColumn("verdict",
          when(col("in_corpus") === 1, lit("drop_corpus"))
            .when(col("rk") > 1, lit("drop_batch"))
            .otherwise(lit("keep")))
        .select(col("doc_id"), col("text_hash"),
          coalesce(col("in_corpus"), lit(0)).as("in_corpus"), col("verdict"))
        .orderBy(col("doc_id"))
    }),

    "q30_exact_dedup" -> ((s, dir) => {
      // Exact dedup: hash-groupBy on content hash; survivor = min doc_id.
      docsWithDups(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("text_hash"))
    }),

    "q31_minhash_signatures" -> ((s, dir) =>
      signatures(s, dir).orderBy(col("doc_id"))),

    "q32_lsh_near_dup" -> ((s, dir) => {
      // Candidate pairs sharing >= 1 of 4 bands. Join key
      // (band, k1, k2) is a hash bucket -> uniform, skew-free shuffle.
      snapshotCandidates(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q33_ngram_jaccard" -> ((s, dir) => {
      // Exact shingle-set Jaccard for consecutive-doc pairs (the
      // deterministic verification stage downstream of LSH candidates).
      // Sets are 64-bit shingle hashes: fixed-width keys, not shingle
      // strings. r15 ONE-PASS formulation (guide §2.4): the old plan
      // scanned/shingled the corpus THREE times (counts branch + both
      // self-join sides) and shuffled the (h1,h2,doc) stream through a
      // 3-key pair join. Instead, each raw shingle row is emitted into
      // its two adjacent pair buckets — pair p compares docs p and p+1,
      // so doc d's shingles belong to pair d (as side a) and pair d−1
      // (as side b) — then ONE (pair,h) aggregation collapses
      // multiplicity to set membership (max of the side flags — this
      // also absorbs shingleHashes' distinct, so the non-distinct
      // stream feeds it directly) and ONE (pair) aggregation counts
      // |A| = Σ a, |B| = Σ b, |A∩B| = Σ a·b. Pairs where either doc
      // has no shingles are filtered — exactly the old inner join of
      // consecutive count rows. Same sets → same integers → identical
      // jaccard bytes.
      val sh = shingleHashStream(table(s, dir, "documents"))
      sh.select(explode(array(
          struct(col("doc_id").as("pair"), col("h1"), col("h2"),
            lit(1).as("a"), lit(0).as("b")),
          struct((col("doc_id") - 1).as("pair"), col("h1"), col("h2"),
            lit(0).as("a"), lit(1).as("b")))).as("e"))
        .select(col("e.pair"), col("e.h1"), col("e.h2"),
          col("e.a"), col("e.b"))
        .groupBy(col("pair"), col("h1"), col("h2"))
        .agg(max(col("a")).as("a"), max(col("b")).as("b"))
        .groupBy(col("pair"))
        .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
          sum(col("a") * col("b")).as("n_inter"))
        .filter(col("n_a") > 0 && col("n_b") > 0)
        .select(col("pair").as("doc_a"), (col("pair") + 1).as("doc_b"),
          col("n_a"), col("n_b"), col("n_inter"))
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
        .orderBy(col("doc_a"))
    }),

    "q61_lsh_verified" -> ((s, dir) =>
      lshVerifiedPairs(table(s, dir, "documents"))
        .orderBy(col("doc_a"), col("doc_b"))),

    "q72_dedup_clusters" -> ((s, dir) => {
      // The stage after pair generation: group near-dup pairs into
      // clusters (connected components), survivor = min doc_id. Each
      // propagation round is a uniform-key shuffle over the PAIR list
      // (tiny vs the corpus), never the corpus itself.
      val cand = snapshotCandidates(s, dir)
      connectedComponents(cand.select(col("doc_a"), col("doc_b")))
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"))
        .orderBy(col("cluster_id"))
    }),

    "q179_cluster_density" -> ((s, dir) => {
      // Cluster-quality audit: edge density of every near-dup cluster
      // — density 1 means a clique (genuine duplicate set), low
      // density means the cluster formed by CHAINING (A~B~C with A
      // and C unrelated — the transitive-drift failure mode of
      // connected-component dedup, made measurable per cluster so a
      // curation run can route tight clusters to auto-drop and chainy
      // ones to review). Pairs checkpointed ONCE for both consumers
      // (labels + per-cluster edge counts); the density math is
      // |edges| / C(n,2) from exact integers.
      val cand = ckpt(snapshotCandidates(s, dir)
        .select(col("doc_a"), col("doc_b")))
      val labels = connectedComponents(cand)
      val sizes = labels.groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"))
      val edges = cand
        .join(labels.withColumnRenamed("node", "doc_a"), "doc_a")
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_edges"))
      sizes.join(edges, Seq("cluster_id"))
        .select(col("cluster_id"), col("n_docs"), col("n_edges"),
          round(col("n_edges").cast("double") * 2.0 /
            (col("n_docs").cast("double") * (col("n_docs") - 1)), 6)
            .as("density"))
        .orderBy(col("cluster_id"))
    }),

    "q93_cluster_representatives" -> ((s, dir) => {
      // Survivor selection UPGRADE over min-id: per near-dup cluster,
      // keep the best-CONNECTED doc (highest degree in the pair graph,
      // ties to the smaller id) — the exemplar most representative of
      // the cluster, which min-id survivorship cannot promise. Degree
      // is one uniform-key agg over the pair list; the argmax is a
      // max(struct) per cluster — no windows, all map-side-combinable.
      // The pair list is checkpointed ONCE so the LSH pipeline doesn't
      // re-execute for the degree branch, and the components come from
      // the O(log n) star contraction (label contract identical to
      // min-label — q77 proves it against the same oracle).
      val cand = ckpt(snapshotCandidates(s, dir)
        .select(col("doc_a"), col("doc_b")))
      val degree = cand.select(col("doc_a").as("node"))
        .union(cand.select(col("doc_b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      connectedComponentsStar(cand)
        .join(degree, "node")
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("degree"), (-col("node")).as("neg")))
            .as("best"))
        .select(col("cluster_id"), col("n_docs"),
          (-col("best.neg")).as("rep_doc"),
          col("best.degree").as("rep_degree"))
        .orderBy(col("cluster_id"))
    }),

    "q77_dedup_clusters_star" -> ((s, dir) => {
      // Same clustering contract as q72, via large-star/small-star
      // contraction — O(log n) rounds instead of diameter rounds, for
      // corpora whose dup graphs have deep chains. Oracle-identical
      // output proves the two algorithms agree end to end.
      val cand = snapshotCandidates(s, dir)
      connectedComponentsStar(cand.select(col("doc_a"), col("doc_b")))
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"))
        .orderBy(col("cluster_id"))
    }),

    "q69_contamination" -> ((s, dir) => {
      // Benchmark-contamination screen: flag corpus docs sharing any
      // 3-gram shingle with a held-out benchmark set (every 97th doc
      // stands in for the eval suite). The benchmark gram set is tiny
      // relative to the corpus, so it BROADCASTS — the corpus-side
      // gram stream is filtered where it is scanned, never shuffled
      // against itself. That is the 100 TB shape: contamination is a
      // broadcast-semi-join, not a corpus-corpus join.
      val docs = table(s, dir, "documents")
      val bench = shingleHashes(docs.filter(col("doc_id") % 97 === 0))
        .select(col("h1"), col("h2")).distinct()
      shingleHashes(docs.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(bench), Seq("h1", "h2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bench_grams"))
        .orderBy(col("doc_id"))
    }),

    "q81_contamination_bloom" -> ((s, dir) => {
      // q69's scale path: when the benchmark gram SET outgrows a
      // broadcast hash set, a fixed-size bloom filter still fits every
      // executor. Build the filter over the bench h1 grams (one small
      // aggregate, collected as plan metadata like the IVF centroids),
      // probe it scan-side with Spark's codegen'd might-contain, and
      // send only the ~fpp survivors into the exact (h1, h2) verify
      // join — so false positives are removed and the output is
      // byte-identical to q69 while the join input shrinks from
      // |corpus grams| to |contaminated grams| + fpp leakage.
      val docs = table(s, dir, "documents")
      val bench = shingleHashes(docs.filter(col("doc_id") % 97 === 0))
        .select(col("h1"), col("h2")).distinct()
      val bloom = bench
        .agg(call_function("bloom_agg", col("h1"), lit(1000000L)).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      shingleHashes(docs.filter(col("doc_id") % 97 =!= 0))
        .filter(call_function("bloom_might_contain", lit(bloom), col("h1")))
        .join(broadcast(bench), Seq("h1", "h2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bench_grams"))
        .orderBy(col("doc_id"))
    }),

    "q34_simhash" -> ((s, dir) =>
      simhashDf(s, dir).orderBy(col("doc_id"))),

    "q50_simhash_pairs" -> ((s, dir) => {
      // SimHash near-dup candidates, skew-safe (r9 redesign). The r8
      // top-8-bit-prefix blocking was content-correlated: simhash bits
      // cluster for similar docs BY DESIGN, so one prefix held 27% of
      // the sf0.1 corpus — a single quadratic reducer. Now: block on
      // 4x4-bit bands of the fingerprint (pigeonhole: a pair within
      // hamming 3 always shares >= 1 clean band), and drop
      // "stop-print" band keys held by > 5% of the corpus (the q112
      // stop-print rule; integer-exact `keyn*20 <= n`, mirrored in the
      // oracle) so no blocking key is ever quadratic in a duplicate
      // cluster. Candidate mass per key is <= cap^2; the hamming
      // filter runs on candidates only, inside codegen.
      simhashPairsBanded(simhashDf(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q63_simhash64" -> ((s, dir) =>
      simhash64Fast(table(s, dir, "documents")).orderBy(col("doc_id"))),

    "q64_simhash64_pairs" -> ((s, dir) => {
      // Corpus-scale SimHash near-dup: 64-bit fingerprints blocked on
      // 4x16-bit bands (multi-table blocking) WITH the stop-print cap
      // (r9 — band values are content-derived, so raw keys skew; the
      // cap is mirrored in the oracle). Candidates = pairs sharing
      // >= 1 clean band — never all-pairs, no key above n/20; the
      // hamming filter runs only on candidates, inside codegen.
      simhash64PairsBanded(simhash64Fast(docsWithDups(s, dir)))
        .orderBy(col("doc_a"), col("doc_b"))
    })
  )

  // ---- 64-bit simhash oracle SQL (shared by q63/q64) -------------------
  private val bits64Sql = (0 until 64).map { i =>
    val src = if (i < 32) s"(lo >> $i)" else s"(hi >> ${i - 32})"
    s"SUM(CASE WHEN $src & 1 = 1 THEN 1 ELSE -1 END) AS b$i"
  }.mkString(", ")
  private val fp64Sql = (0 until 64).map(i =>
    s"CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    .mkString(" + ")
  private def band64Sql(b: Int): String = (0 until 16).map(j =>
    s"CASE WHEN b${16 * b + j} > 0 THEN ${1L << j} ELSE 0 END")
    .mkString(" + ")
  private def simhash64CteSql(docsSrc: String): String =
    s"""toks AS (
       |  SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
       |  FROM $docsSrc),
       |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,8))::BIGINT AS lo,
       |        ('0x'||substr(md5(tok),9,8))::BIGINT AS hi FROM toks),
       |bits AS (SELECT doc_id, $bits64Sql FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($fp64Sql AS BIGINT) AS simhash64,
       |  CAST(${band64Sql(0)} AS BIGINT) AS band0,
       |  CAST(${band64Sql(1)} AS BIGINT) AS band1,
       |  CAST(${band64Sql(2)} AS BIGINT) AS band2,
       |  CAST(${band64Sql(3)} AS BIGINT) AS band3
       |  FROM bits)""".stripMargin

  /** Ground truth for near-dup clustering (q72 + q77): LSH candidate
    * pairs, then components via a recursive reachability CTE. Shared by
    * both algorithm variants — they must agree byte-for-byte. */
  /** The q61 verified-pair SQL (no ORDER BY) — string-shared by q178's
    * per-doc kNN so the mirror provably ranks the gated pipeline's own
    * pairs. */
  private[operators] val lshVerifiedSql: String =
    s"""WITH sh AS ($shinglesSql),
       |shh AS ($shingleHashSql),
       |sig AS ($signaturesSql),
       |bands AS ($bandsSql),
       |bx AS ($lshBxSql),
       |cand AS ($lshCandSql),
       |cnts AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN shh x ON x.doc_id = c.doc_a
       |  JOIN shh y ON y.doc_id = c.doc_b
       |    AND y.h1 = x.h1 AND y.h2 = x.h2
       |  GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b, c.n_shared_bands,
       | ca.n_sh AS n_a, cb.n_sh AS n_b,
       | COALESCE(i.n_inter, 0) AS n_inter,
       | ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
       |   / (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0)), 6) AS jaccard
       |FROM cand c
       |JOIN cnts ca ON c.doc_a = ca.doc_id
       |JOIN cnts cb ON c.doc_b = cb.doc_id
       |LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b""".stripMargin

  /** The recursive-CC CTE chain up through `comp` (node, cluster_id)
    * and `cand` (the LSH pairs) — shared by q72 and q179 so both
    * mirrors provably cluster the same pairs. */
  private val dedupClustersCtes =
    s"""WITH RECURSIVE sh AS ($shinglesSql),
       |sig AS ($signaturesSql),
       |bands AS ($bandsSql),
       |bx AS ($lshBxSql),
       |cand AS ($lshCandSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION ALL SELECT doc_b, doc_a FROM cand),
       |reach AS (
       |  SELECT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e.src AS node, r.label
       |  FROM edges e JOIN reach r ON r.node = e.dst),
       |comp AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node)""".stripMargin

  private val dedupClustersSql =
    dedupClustersCtes +
      """
        |SELECT cluster_id, COUNT(*) AS n_docs, MAX(node) AS max_doc
        |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q149_source_overlap" ->
      """WITH sh AS (
        |  SELECT d.source, array_to_string(toks[i:i+2], ' ') AS sh
        |  FROM (SELECT source, regexp_split_to_array(text, '\s+') AS toks
        |        FROM documents) d,
        |    UNNEST(generate_series(1, len(toks)-2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |h AS (
        |  SELECT DISTINCT source,
        |    ('0x'||substr(md5(sh),1,8))::BIGINT AS h
        |  FROM sh),
        |rk AS (
        |  SELECT source, h,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
        |  FROM h),
        |sig AS (
        |  SELECT source, list(h ORDER BY h) AS sig
        |  FROM rk WHERE rk <= 128 GROUP BY source),
        |p AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    a.sig AS sa, b.sig AS sb
        |  FROM sig a JOIN sig b ON a.source < b.source),
        |un AS (
        |  SELECT src_a, src_b, sa, sb,
        |    list_sort(list_distinct(sa || sb))[1:128] AS u
        |  FROM p),
        |i AS (
        |  SELECT src_a, src_b,
        |    len(list_filter(u, x -> list_contains(sa, x)
        |      AND list_contains(sb, x))) AS inter_k,
        |    len(u) AS uk
        |  FROM un)
        |SELECT src_a, src_b, CAST(inter_k AS BIGINT) AS inter_k,
        |  ROUND(CAST(inter_k AS DOUBLE) / uk, 6) AS est_jaccard
        |FROM i ORDER BY src_a, src_b""".stripMargin,
    "q126_keep_best" ->
      s"""WITH d AS (SELECT *, md5(text) AS text_hash FROM ($dupSql)),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY text_hash
         |        ORDER BY n_chars DESC, doc_id DESC) AS rk,
         |        COUNT(*) OVER (PARTITION BY text_hash) AS n_copies
         |      FROM d)
         |SELECT text_hash, doc_id AS keep_id, n_chars,
         |  CAST(n_copies AS BIGINT) AS n_copies
         |FROM r WHERE rk = 1 ORDER BY text_hash""".stripMargin,

    "q120_dup_span_mask" ->
      s"""WITH corpus AS ($cdcCorpusSql),
         |aw AS ($awSql),
         |dup AS (SELECT h FROM aw GROUP BY h HAVING COUNT(*) >= 2),
         |pd AS (SELECT doc_id, COUNT(*) AS n_dup
         |       FROM aw JOIN dup USING (h) GROUP BY doc_id),
         |cnts AS (SELECT doc_id, COUNT(*) AS n_aw FROM aw GROUP BY doc_id)
         |SELECT c.doc_id,
         |  CAST(COALESCE(n.n_aw, 0) AS BIGINT) AS n_aw,
         |  CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup,
         |  CASE WHEN COALESCE(n.n_aw, 0) > 0
         |    THEN ROUND(COALESCE(p.n_dup, 0) * 1.0 / n.n_aw, 6) END AS dup_frac
         |FROM corpus c
         |LEFT JOIN cnts n USING (doc_id)
         |LEFT JOIN pd p USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q121_containment" -> containmentPairsSql,

    "q143_dedup_report" ->
      s"""WITH cp AS ($containmentPairsSql)
         |SELECT method, n_universe, n_affected,
         |  ROUND(n_affected * 1.0 / n_universe, 6) AS rate, action
         |FROM (
         |  SELECT 'exact' AS method,
         |    CAST(SUM(n) AS BIGINT) AS n_universe,
         |    CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_affected,
         |    'drop' AS action
         |  FROM (SELECT COUNT(*) AS n FROM ($dupSql) dd
         |        GROUP BY md5(text)) f
         |  UNION ALL
         |  SELECT 'near_dup',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
         |    CAST(COALESCE(SUM(n_docs), 0) - COUNT(*) AS BIGINT), 'drop'
         |  FROM ($dedupClustersSql) cc
         |  UNION ALL
         |  SELECT 'dup_span',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ($cdcCorpusSql) c0),
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM (
         |       WITH corpus AS ($cdcCorpusSql),
         |       hits AS ($awHitsSql),
         |       aw AS (SELECT DISTINCT doc_id, h FROM hits),
         |       dup AS (SELECT h FROM aw GROUP BY h HAVING COUNT(*) >= 2)
         |       SELECT DISTINCT hits.doc_id FROM hits JOIN dup USING (h)) sd),
         |    'trim'
         |  UNION ALL
         |  SELECT 'containment',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ($cdcCorpusSql) c1),
         |    (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM (
         |       SELECT doc_a AS doc_id FROM cp
         |       UNION ALL SELECT doc_b FROM cp) u),
         |    'review'
         |  UNION ALL
         |  SELECT 'semantic',
         |    CAST(SUM(n_members) AS BIGINT),
         |    CAST(SUM(n_dropped) AS BIGINT), 'drop'
         |  FROM (${Similarity.semDedupSql}) sm
         |) ORDER BY method""".stripMargin,

    "q134_shingle_novelty" ->
      s"""WITH sh AS ($shinglesSql),
         |shh AS ($shingleHashSql),
         |df AS (SELECT h1, h2, COUNT(*) AS df FROM shh GROUP BY 1, 2)
         |SELECT s.doc_id, COUNT(*) AS n_sh,
         |  CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unique,
         |  ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
         |    / COUNT(*), 6) AS novelty
         |FROM shh s JOIN df d USING (h1, h2)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // same novelty arithmetic as q134 (shared shingle CTEs), bucketed
    // by crawl-order decile
    "q181_novelty_trend" ->
      s"""WITH sh AS ($shinglesSql),
         |shh AS ($shingleHashSql),
         |df AS (SELECT h1, h2, COUNT(*) AS df FROM shh GROUP BY 1, 2),
         |nv AS (
         |  SELECT s.doc_id,
         |    ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
         |      / COUNT(*), 6) AS novelty
         |  FROM shh s JOIN df d USING (h1, h2)
         |  GROUP BY s.doc_id),
         |qd AS (
         |  SELECT doc_id, novelty,
         |    CAST(NTILE(10) OVER (ORDER BY doc_id) AS INTEGER) AS decile
         |  FROM nv)
         |SELECT decile, COUNT(*) AS n_docs,
         |  ROUND(CAST(SUM(CAST(novelty AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*), 6) AS mean_novelty
         |FROM qd GROUP BY 1 ORDER BY decile""".stripMargin,

    "q130_dup_span_merge" ->
      s"""WITH corpus AS ($cdcCorpusSql),
         |hits AS ($awHitsSql),
         |aw AS (SELECT DISTINCT doc_id, h FROM hits),
         |dup AS (SELECT h FROM aw GROUP BY h HAVING COUNT(*) >= 2),
         |dh AS (SELECT hits.doc_id, hits.pos, hits.pos + 49 AS e
         |       FROM hits JOIN dup USING (h)),
         |seq AS (
         |  SELECT doc_id, pos, e,
         |    MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM dh),
         |isl AS (
         |  SELECT doc_id, pos, e,
         |    SUM(CASE WHEN pmax IS NULL OR pos > pmax + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM seq),
         |spans AS (SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e
         |          FROM isl GROUP BY 1, 2),
         |agg AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s + 1) AS masked
         |        FROM spans GROUP BY 1)
         |SELECT c.doc_id, CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(a.masked, 0) AS BIGINT) AS masked_chars,
         |  ROUND(COALESCE(a.masked, 0) * 1.0 / length(c.text), 6) AS masked_frac
         |FROM corpus c LEFT JOIN agg a USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,

    "q131_incremental_lsh" ->
      s"""WITH nb AS ($recrawlSql),
         |shc AS (${shinglesSqlFrom("documents")}),
         |shb AS (${shinglesSqlFrom("nb")}),
         |sigc AS (${signaturesSqlFrom("shc")}),
         |sigb AS (${signaturesSqlFrom("shb")}),
         |bc AS (${bandsSqlFrom("sigc")}),
         |bb AS (${bandsSqlFrom("sigb")}),
         |chot AS (
         |  SELECT s.band, s.k1, s.k2, s.anchor
         |  FROM (SELECT band, k1, k2, COUNT(*) AS bn,
         |          MIN(doc_id) AS anchor
         |        FROM bc GROUP BY 1, 2, 3) s
         |  CROSS JOIN (SELECT COUNT(*) AS tot FROM bc) t
         |  WHERE s.bn * ${20 * BANDS} > t.tot AND s.bn > 64),
         |cprobe AS (
         |  SELECT c.doc_id, c.band, c.k1, c.k2 FROM bc c
         |  WHERE NOT EXISTS (SELECT 1 FROM chot h
         |    WHERE h.band = c.band AND h.k1 = c.k1 AND h.k2 = c.k2)
         |  UNION ALL
         |  SELECT anchor AS doc_id, band, k1, k2 FROM chot),
         |cand AS (
         |  SELECT bb.doc_id AS batch_id, c.doc_id AS corpus_id,
         |    COUNT(*) AS n_shared_bands
         |  FROM cprobe c JOIN bb
         |    ON c.band = bb.band AND c.k1 = bb.k1 AND c.k2 = bb.k2
         |  GROUP BY 1, 2),
         |shhc AS (${shingleHashSqlFrom("shc")}),
         |shhb AS (${shingleHashSqlFrom("shb")}),
         |nb_sz AS (SELECT doc_id, COUNT(*) AS n FROM shhb GROUP BY 1),
         |c_sz AS (SELECT doc_id, COUNT(*) AS n FROM shhc GROUP BY 1),
         |inter AS (
         |  SELECT c.batch_id, c.corpus_id, COUNT(*) AS n_inter
         |  FROM cand c
         |  JOIN shhb x ON x.doc_id = c.batch_id
         |  JOIN shhc y ON y.doc_id = c.corpus_id
         |    AND x.h1 = y.h1 AND x.h2 = y.h2
         |  GROUP BY 1, 2)
         |SELECT c.batch_id, c.corpus_id, c.n_shared_bands,
         |  zb.n AS n_batch, zc.n AS n_corpus,
         |  COALESCE(i.n_inter, 0) AS n_inter,
         |  ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE) /
         |        (zb.n + zc.n - COALESCE(i.n_inter, 0)), 6) AS jaccard
         |FROM cand c
         |JOIN nb_sz zb ON zb.doc_id = c.batch_id
         |JOIN c_sz zc ON zc.doc_id = c.corpus_id
         |LEFT JOIN inter i
         |  ON i.batch_id = c.batch_id AND i.corpus_id = c.corpus_id
         |ORDER BY c.batch_id, c.corpus_id""".stripMargin,

    "q119_edit_distance_pairs" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 8) AS blk,
        |    substr(text, 1, 60) AS pfx
        |  FROM documents),
        |ok AS (SELECT blk FROM p GROUP BY blk HAVING COUNT(*) <= 1000),
        |pc AS (SELECT p.* FROM p JOIN ok USING (blk))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
        |FROM pc a JOIN pc b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pfx, b.pfx) <= 15
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q97_incremental_dedup" ->
      s"""WITH nb AS (
         |  SELECT doc_id, md5(text) AS text_hash FROM ($recrawlSql)),
         |hits AS (
         |  SELECT DISTINCT md5(text) AS text_hash FROM documents
         |  WHERE md5(text) IN (SELECT text_hash FROM nb)),
         |r AS (
         |  SELECT nb.doc_id, nb.text_hash,
         |    CASE WHEN h.text_hash IS NOT NULL THEN 1 ELSE 0 END AS in_corpus,
         |    ROW_NUMBER() OVER (PARTITION BY nb.text_hash
         |      ORDER BY nb.doc_id) AS rk
         |  FROM nb LEFT JOIN hits h USING (text_hash))
         |SELECT doc_id, text_hash, CAST(in_corpus AS INT) AS in_corpus,
         | CASE WHEN in_corpus = 1 THEN 'drop_corpus'
         |      WHEN rk > 1 THEN 'drop_batch' ELSE 'keep' END AS verdict
         |FROM r ORDER BY doc_id""".stripMargin,

    "q30_exact_dedup" ->
      s"""SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
         | COUNT(*) AS n_copies
         |FROM ($dupSql)
         |GROUP BY md5(text) ORDER BY text_hash""".stripMargin,

    "q31_minhash_signatures" ->
      s"""WITH sh AS ($shinglesSql)
         |$signaturesSql ORDER BY doc_id""".stripMargin,

    "q32_lsh_near_dup" ->
      s"""WITH sh AS ($shinglesSql),
         |sig AS ($signaturesSql),
         |bands AS ($bandsSql),
         |bx AS ($lshBxSql),
         |cand AS ($lshCandSql)
         |SELECT doc_a, doc_b, n_shared_bands
         |FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    "q33_ngram_jaccard" ->
      s"""WITH sh AS ($shinglesSql),
         |shh AS ($shingleHashSql),
         |cnts AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS doc_a, COUNT(*) AS n_inter
         |  FROM shh x JOIN shh y
         |    ON x.h1 = y.h1 AND x.h2 = y.h2 AND y.doc_id = x.doc_id + 1
         |  GROUP BY 1)
         |SELECT ca.doc_id AS doc_a, cb.doc_id AS doc_b,
         | ca.n_sh AS n_a, cb.n_sh AS n_b,
         | COALESCE(i.n_inter, 0) AS n_inter,
         | ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |   / (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0)), 6) AS jaccard
         |FROM cnts ca JOIN cnts cb ON cb.doc_id = ca.doc_id + 1
         |LEFT JOIN inter i ON ca.doc_id = i.doc_a
         |ORDER BY doc_a""".stripMargin,

    "q72_dedup_clusters" -> dedupClustersSql,

    // string-shares the q72 recursive-CC chain: the densities are
    // provably measured over the gated clustering's own components
    "q179_cluster_density" ->
      (dedupClustersCtes + """,
        |sizes AS (
        |  SELECT cluster_id, COUNT(*) AS n_docs FROM comp GROUP BY 1),
        |ec AS (
        |  SELECT c2.cluster_id, COUNT(*) AS n_edges
        |  FROM cand JOIN comp c2 ON c2.node = cand.doc_a GROUP BY 1)
        |SELECT s.cluster_id, s.n_docs, ec.n_edges,
        |  ROUND(CAST(ec.n_edges AS DOUBLE) * 2.0 /
        |    (CAST(s.n_docs AS DOUBLE) * (s.n_docs - 1)), 6) AS density
        |FROM sizes s JOIN ec ON ec.cluster_id = s.cluster_id
        |ORDER BY s.cluster_id""".stripMargin),

    // identical ground truth: the star-contraction variant must produce
    // byte-identical clusters to min-label propagation
    "q77_dedup_clusters_star" -> dedupClustersSql,

    "q93_cluster_representatives" ->
      s"""WITH RECURSIVE sh AS ($shinglesSql),
         |sig AS ($signaturesSql),
         |bands AS ($bandsSql),
         |bx AS ($lshBxSql),
         |cand AS ($lshCandSql),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM cand
         |  UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS node, r.label
         |  FROM edges e JOIN reach r ON r.node = e.dst),
         |comp AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
         |deg AS (SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY src),
         |ranked AS (
         |  SELECT c.cluster_id, c.node, d.degree,
         |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |      ORDER BY d.degree DESC, c.node ASC) AS rk,
         |    COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_docs
         |  FROM comp c JOIN deg d ON d.node = c.node)
         |SELECT cluster_id, n_docs, node AS rep_doc, degree AS rep_degree
         |FROM ranked WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    "q69_contamination" ->
      s"""WITH sh AS ($shinglesSql),
         |shh AS ($shingleHashSql),
         |bench AS (
         |  SELECT DISTINCT h1, h2 FROM shh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, COUNT(*) AS n_bench_grams
         |FROM shh s JOIN bench b ON s.h1 = b.h1 AND s.h2 = b.h2
         |WHERE s.doc_id % 97 <> 0
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,

    // identical ground truth: the bloom prefilter is exact-verified,
    // so q81 must reproduce q69 byte-for-byte
    "q81_contamination_bloom" ->
      s"""WITH sh AS ($shinglesSql),
         |shh AS ($shingleHashSql),
         |bench AS (
         |  SELECT DISTINCT h1, h2 FROM shh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, COUNT(*) AS n_bench_grams
         |FROM shh s JOIN bench b ON s.h1 = b.h1 AND s.h2 = b.h2
         |WHERE s.doc_id % 97 <> 0
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,

    "q50_simhash_pairs" -> {
      val bits = (0 until 16).map(i =>
        s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(", ")
      val fp = (0 until 16).map(i =>
        s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,8))::BIGINT AS h FROM toks),
         |bits AS (SELECT doc_id, $bits FROM h GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash16 FROM bits),
         |bands AS (
         |  SELECT doc_id, simhash16, bb.band,
         |         (simhash16 >> (4 * bb.band)) & 15 AS bval
         |  FROM sh, (SELECT UNNEST([0,1,2,3]) AS band) bb),
         |keyn AS (SELECT band, bval, COUNT(*) AS keyn
         |         FROM bands GROUP BY 1, 2),
         |total AS (SELECT COUNT(*) AS n FROM sh),
         |ok AS (
         |  SELECT d.doc_id, d.simhash16, d.band, d.bval
         |  FROM bands d
         |  JOIN keyn k ON d.band = k.band AND d.bval = k.bval
         |  CROSS JOIN total t
         |  WHERE k.keyn * 20 <= t.n OR k.keyn <= 64)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | MIN(CAST(bit_count(xor(a.simhash16, b.simhash16)) AS INT)) AS hamming
         |FROM ok a JOIN ok b
         |  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING MIN(bit_count(xor(a.simhash16, b.simhash16))) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q61_lsh_verified" ->
      (lshVerifiedSql + "\nORDER BY c.doc_a, c.doc_b"),

    "q34_simhash" -> {
      val bits = (0 until 16).map(i =>
        s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(", ")
      val fp = (0 until 16).map(i =>
        s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,8))::BIGINT AS h FROM toks),
         |bits AS (SELECT doc_id, $bits FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash16,
         | CAST(($fp) // 256 AS BIGINT) AS bucket
         |FROM bits ORDER BY doc_id""".stripMargin
    },

    "q63_simhash64" ->
      s"""WITH ${simhash64CteSql("documents")}
         |SELECT doc_id, simhash64, band0, band1, band2, band3
         |FROM sh ORDER BY doc_id""".stripMargin,

    "q64_simhash64_pairs" -> {
      val bandsUnion = (0 until 4).map(b =>
        s"SELECT doc_id, simhash64, $b AS band, band$b AS bval FROM sh")
        .mkString("\nUNION ALL\n")
      s"""WITH ${simhash64CteSql(s"($dupSql)")},
         |bands AS ($bandsUnion),
         |keyn AS (SELECT band, bval, COUNT(*) AS keyn
         |         FROM bands GROUP BY 1, 2),
         |total AS (SELECT COUNT(*) AS n FROM sh),
         |ok AS (
         |  SELECT d.doc_id, d.simhash64, d.band, d.bval
         |  FROM bands d
         |  JOIN keyn k ON d.band = k.band AND d.bval = k.bval
         |  CROSS JOIN total t
         |  WHERE k.keyn * 20 <= t.n OR k.keyn <= 64)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | COUNT(*) AS n_shared_bands,
         | MIN(CAST(bit_count(xor(a.simhash64, b.simhash64)) AS INT)) AS hamming
         |FROM ok a JOIN ok b
         |  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING MIN(bit_count(xor(a.simhash64, b.simhash64))) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin
    }
  )
}
