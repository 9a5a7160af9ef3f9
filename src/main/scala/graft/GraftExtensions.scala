package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{aggregate, BloomFilterMightContain, Expression, ExpressionInfo, Literal}

import graft.functions.{CdcWindowHashes, CdcWindowHits, CharBigramsPacked, CosineSimilarity, FreqTopKAgg, HammingDistance, KllQuantile, KllSketchAgg, KmvEstimate, KmvIntersectEstimate, KmvSketchAgg, KmvUnionAgg, Md5Hash64, PackedLmSum, PqAdc, PqEncode, RhpDots, ShingleHashes, SimHashAgg, WinnowPrints}

/** SparkSessionExtensions installer: registers graft's native SQL
  * functions so `spark.sql("SELECT cosine_sim(a, b) ...")` and
  * `call_function("cosine_sim", ...)` work on any session built with
  * `GraftSession.build` (or `--conf spark.sql.extensions=graft.GraftExtensions`),
  * plus the planner strategy for the whole-operator merge as-of join.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // Fixed-arity builders validate BEFORE indexing so a wrong-arity
    // SQL call gets a usage message, not a raw IndexOutOfBounds from
    // exprs(1) during resolution (r9 review fix; the variadic sketch
    // builders below already pattern-match their arity).
    def arity(exprs: Seq[Expression], n: Int, usage: String): Seq[Expression] =
      if (exprs.length == n) exprs
      else throw new IllegalArgumentException(
        s"$usage - got ${exprs.length} argument(s)")
    e.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    e.injectPlannerStrategy(_ => new graft.plans.GroupTopKStrategy)
    e.injectPlannerStrategy(_ => new graft.plans.LshTvfStrategy)
    // SQL-only reach for the custom whole-operator plans (r9): table-
    // valued functions resolving catalog/view names through the active
    // session and delegating to the df-level faces (SqlSurface).
    e.injectTableFunction((
      new FunctionIdentifier("asof_join"),
      new ExpressionInfo(SqlSurface.getClass.getName, "asof_join"),
      (exprs: Seq[Expression]) => SqlSurface.asofJoinBuilder(exprs)))
    e.injectTableFunction((
      new FunctionIdentifier("group_topk"),
      new ExpressionInfo(SqlSurface.getClass.getName, "group_topk"),
      (exprs: Seq[Expression]) => SqlSurface.groupTopKBuilder(exprs)))
    // SQL face for the standing near-dup index (r12 verdict ask #5):
    // a SQL-only session reaches the fingerprint-cached snapshot
    // artifact — candidate pairs and batch probes — without the
    // Dataset API (SqlSurface documents the path-keyed contract).
    e.injectTableFunction((
      new FunctionIdentifier("lsh_candidate_pairs"),
      new ExpressionInfo(SqlSurface.getClass.getName, "lsh_candidate_pairs"),
      (exprs: Seq[Expression]) => SqlSurface.lshCandidatePairsBuilder(exprs)))
    e.injectTableFunction((
      new FunctionIdentifier("lsh_probe"),
      new ExpressionInfo(SqlSurface.getClass.getName, "lsh_probe"),
      (exprs: Seq[Expression]) => SqlSurface.lshProbeBuilder(exprs)))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "cosine_sim(a, b)"); CosineSimilarity(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("cdc_window_hashes"),
      new ExpressionInfo(classOf[CdcWindowHashes].getName, "cdc_window_hashes"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "cdc_window_hashes(text, win literal)"); CdcWindowHashes(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("cdc_window_hits"),
      new ExpressionInfo(classOf[CdcWindowHits].getName, "cdc_window_hits"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "cdc_window_hits(text, win literal)"); CdcWindowHits(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("char_bigrams_packed"),
      new ExpressionInfo(classOf[CharBigramsPacked].getName, "char_bigrams_packed"),
      (exprs: Seq[Expression]) => CharBigramsPacked(arity(exprs, 1, "char_bigrams_packed(text)").head)))
    e.injectFunction((
      new FunctionIdentifier("packed_lm_sum"),
      new ExpressionInfo(classOf[PackedLmSum].getName, "packed_lm_sum"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "packed_lm_sum(packed, model literal)"); PackedLmSum(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "pq_encode(vec, codebook literal)"); PqEncode(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "pq_adc(codes, lut literal)"); PqAdc(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("winnow_prints"),
      new ExpressionInfo(classOf[WinnowPrints].getName, "winnow_prints"),
      (exprs: Seq[Expression]) => WinnowPrints(arity(exprs, 1, "winnow_prints(text)").head)))
    // Exact percentile over doubles on a primitive-map buffer —
    // value-identical to the built-in `percentile` (same grouping,
    // ordering and interpolation; see PercentileExactAgg), minus its
    // boxed per-row OpenHashMap updates.
    e.injectFunction((
      new FunctionIdentifier("percentile_exact"),
      new ExpressionInfo(classOf[graft.functions.PercentileExactAgg].getName,
        "percentile_exact"),
      (exprs: Seq[Expression]) => {
        // explicit input coercion (the built-in gets this from
        // ImplicitCastInputTypes, which is private[sql]): values to
        // double — lossless at every call site (doubles already, or
        // integer seconds << 2^53) — percentages (decimal literals in
        // `array(0.5, ...)`) to double/array<double>, freq to bigint
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
        def toD(v: Expression) = Cast(v, DoubleType)
        def toP(p: Expression) = p.dataType match {
          case _: ArrayType => Cast(p, ArrayType(DoubleType, containsNull = false))
          case _ => Cast(p, DoubleType)
        }
        (exprs match {
          case Seq(c, p) =>
            graft.functions.PercentileExactAgg(toD(c), toP(p), Literal(1L))
          case Seq(c, p, f) =>
            graft.functions.PercentileExactAgg(toD(c), toP(p), Cast(f, LongType))
          case _ => throw new IllegalArgumentException(
            "percentile_exact(value, percentages[, freq])")
        }).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("rhp_bucket"),
      new ExpressionInfo(classOf[RhpDots].getName, "rhp_bucket"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "rhp_bucket(embedding, planes literal)"); RhpDots(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("portable_hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "portable_hash64"),
      (exprs: Seq[Expression]) => Md5Hash64(arity(exprs, 1, "portable_hash64(text)").head)))
    e.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(arity(exprs, 1, "shingle_hashes(text)").head)))
    e.injectFunction((
      new FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_dist"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "hamming_dist(a, b)"); HammingDistance(a(0), a(1)) }))
    e.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => SimHashAgg(arity(exprs, 1, "simhash_agg(hash)").head).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("simhash64_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash64_agg"),
      (exprs: Seq[Expression]) =>
        SimHashAgg(arity(exprs, 1, "simhash64_agg(hash)").head,
          bits = 64).toAggregateExpression()))
    // Misra-Gries heavy hitters: `freq_topk_agg(item[, capacity])` —
    // capacity counters per partial buffer instead of a token-key
    // shuffle of the whole stream; mergeable under any merge tree
    // (see FreqTopKAgg for the bounds the spec asserts).
    e.injectFunction((
      new FunctionIdentifier("freq_topk_agg"),
      new ExpressionInfo(classOf[FreqTopKAgg].getName, "freq_topk_agg"),
      (exprs: Seq[Expression]) => (exprs match {
        case Seq(c) => FreqTopKAgg(c)
        case Seq(c, k) if k.foldable =>
          FreqTopKAgg(c, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "freq_topk_agg(item[, capacity literal])")
      }).toAggregateExpression()))
    // K-minimum-values distinct sketch family: union AND intersection
    // estimates over segment sketches (audience overlap — the set
    // operation the HLL family cannot express; see KmvSketch).
    def litInt(e: Expression, what: String): Int =
      if (e.foldable) e.eval().asInstanceOf[Number].intValue()
      else throw new IllegalArgumentException(s"$what must be a literal")
    e.injectFunction((
      new FunctionIdentifier("kmv_sketch_agg"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch_agg"),
      (exprs: Seq[Expression]) => (exprs match {
        case Seq(c) => KmvSketchAgg(c)
        case Seq(c, k) => KmvSketchAgg(c, litInt(k, "kmv_sketch_agg k"))
        case _ => throw new IllegalArgumentException(
          "kmv_sketch_agg(value[, k literal])")
      }).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("kmv_union_agg"),
      new ExpressionInfo(classOf[KmvUnionAgg].getName, "kmv_union_agg"),
      (exprs: Seq[Expression]) => (exprs match {
        case Seq(c) => KmvUnionAgg(c)
        case Seq(c, k) => KmvUnionAgg(c, litInt(k, "kmv_union_agg k"))
        case _ => throw new IllegalArgumentException(
          "kmv_union_agg(sketch[, k literal])")
      }).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("kmv_estimate"),
      new ExpressionInfo(classOf[KmvEstimate].getName, "kmv_estimate"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => KmvEstimate(c)
        case Seq(c, k) => KmvEstimate(c, litInt(k, "kmv_estimate k"))
        case _ => throw new IllegalArgumentException(
          "kmv_estimate(sketch[, k literal])")
      }))
    e.injectFunction((
      new FunctionIdentifier("kmv_intersect_estimate"),
      new ExpressionInfo(classOf[KmvIntersectEstimate].getName,
        "kmv_intersect_estimate"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => KmvIntersectEstimate(a, b)
        case Seq(a, b, k) =>
          KmvIntersectEstimate(a, b, litInt(k, "kmv_intersect_estimate k"))
        case _ => throw new IllegalArgumentException(
          "kmv_intersect_estimate(a, b[, k literal])")
      }))
    // KLL streaming-quantiles sketch: `kll_sketch_agg(value[, k])`
    // builds the mergeable level-weighted buffer (O(k) memory at any
    // n; persistable array<array<double>> value), `kll_quantile(sk, p)`
    // reads rank-based quantiles off it — the quantile rung of the
    // sketch ladder next to HLL/KMV/MG/CMS (see KllSketch).
    e.injectFunction((
      new FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (exprs: Seq[Expression]) => (exprs match {
        case Seq(c) => KllSketchAgg(c)
        case Seq(c, k) => KllSketchAgg(c, litInt(k, "kll_sketch_agg k"))
        case _ => throw new IllegalArgumentException(
          "kll_sketch_agg(value[, k literal])")
      }).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (exprs: Seq[Expression]) => { val a = arity(exprs, 2, "kll_quantile(sketch, p)"); KllQuantile(a(0), a(1)) }))
    // Spark's internal bloom sketch pair (used by its own runtime row
    // filters), surfaced as SQL functions: build a fixed-size filter
    // over a long column, probe it scan-side with codegen — the
    // shape for membership screens whose key set outgrows a broadcast
    // hash set (SURVEY §5: contamination at 100 TB).
    e.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[aggregate.BloomFilterAggregate].getName, "bloom_agg"),
      (exprs: Seq[Expression]) => (exprs match {
        case Seq(c) => new aggregate.BloomFilterAggregate(c)
        case Seq(c, est) => new aggregate.BloomFilterAggregate(c, est)
        case Seq(c, est, bits) => new aggregate.BloomFilterAggregate(c, est, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_agg(value[, estimatedNumItems[, numBits]])")
      }).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        { val a = arity(exprs, 2, "bloom_might_contain(bloom, value)");
          BloomFilterMightContain(a(0), a(1)) }))
  }
}
