package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.{ckpt, portableHash, table}

/** Pack C (text analysis) — language ID, quality scoring, token
  * counting, document fingerprinting over `documents`
  * (SURVEY.md §2.C8-C11).
  *
  * All scoring is pure integer/rational arithmetic on identical
  * tokenizations (no transcendental functions), so Spark and DuckDB
  * produce bit-identical doubles.
  *
  * Scale notes: every operator here is a narrow map + one hash
  * aggregation — no joins, no skew; regex work happens scan-side
  * inside whole-stage codegen.
  */
object TextOps {

  private val stop = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("de", "shi", "le", "wo", "bu"))
  private val langs = Seq("en", "de", "es", "fr", "zh")

  private val punctRe = "[.,!?;:]"
  private val upperRe = "[A-Z]"
  private val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Perplexity-proxy scoring (the q109 operator, shared with q144's
    * CCNet buckets): each doc's avg log-likelihood under the CORPUS's
    * own char-bigram distribution — junk with atypical character
    * statistics scores low where length/punct heuristics (q38) pass
    * it. Returns (doc_id, n_bigrams, avg_logp), unordered.
    *
    * Two-phase scale shape: the train pass is one aggregation whose
    * map-side partials collapse to ≤|alphabet|² rows (the char stream
    * fans out scan-side but combines before the shuffle); the
    * collected model (like q81's bloom / IVF centroids) derives a
    * ≤|alphabet|² log-prob table that BROADCAST-joins the scan-side
    * bigram stream, and the per-doc avg re-agg is map-side-combinable.
    * ln(c/total) is computed identically in both engines; round(6)
    * absorbs the sum order. Train keys are PACKED CODEPOINT PAIRS
    * (cp1·2^21 + cp2, collision-free for any text) from the native
    * char_bigrams_packed kernel — one codepoint walk per doc.
    *
    * Lookup ladder, measured at sf0.1: a map-literal element_at is a
    * LINEAR scan per probe (13.1 s); explode + broadcast hash join +
    * re-agg is codegen'd but fans every bigram through a join (8.3 s);
    * when the model itself proves the corpus single-byte, a 128×128
    * dense log-prob table makes the fold a pure scan-side O(1)-probe
    * pass — no explode, no join, no re-agg shuffle (the probe loop is
    * the native packed_lm_sum, summing left-to-right exactly like the
    * HOF fold it replaced, so round(sum/n, 6) is bit-stable). */
  def charLmScores(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val bigs = docs.filter(length(col("text")) >= 2)
      .withColumn("bigs", call_function("char_bigrams_packed", col("text")))
    val model = bigs
      .select(explode(col("bigs")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .collect()
    val total = model.map(_.getAs[Long]("c")).sum.toDouble
    val entries = model.map { r =>
      r.getAs[Long]("bg") -> math.log(r.getAs[Long]("c") / total)
    }
    val allSingleByte = entries.forall { case (bg, _) =>
      (bg >> 21) < 128 && (bg & 0x1FFFFF) < 128
    }
    if (allSingleByte) {
      val arr = Array.fill(128 * 128)(-20.0)
      entries.foreach { case (bg, lp) =>
        arr(((bg >> 21) * 128 + (bg & 0x1FFFFF)).toInt) = lp
      }
      bigs
        .withColumn("n_bigrams", size(col("bigs")).cast("long"))
        .withColumn("avg_logp", round(
          call_function("packed_lm_sum", col("bigs"), typedLit(arr.toSeq))
            / col("n_bigrams"), 6))
        .select(col("doc_id"), col("n_bigrams"), col("avg_logp"))
    } else {
      import s.implicits._
      val probs = entries.toSeq.toDF("bg", "logp")
      bigs
        .select(col("doc_id"), explode(col("bigs")).as("bg"))
        .join(broadcast(probs), "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("logp")) / count(lit(1)), 6).as("avg_logp"))
    }
  }

  /** Universal stopword probe list for the Gopher stopword rule. */
  private val gopherStops = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Gopher-style hard quality rules for any (doc_id, text) frame
    * (the q145 operator): per-doc metrics + fail bitmask
    * (1=word-count, 2=mean-word-length, 4=duplicate-fraction,
    * 8=stopwords) + keep flag. Scan-side HOF folds only. */
  /** `carry`: extra input columns threaded through the projection so a
    * grouped consumer (q182's per-source matrix) runs off ONE corpus
    * scan instead of re-joining the doc table on doc_id (r9 review
    * fix). */
  def gopherRules(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs
      .withColumn("toks",
        filter(split(lower(col("text")), "\\s+"), t => length(t) >= 1))
      .withColumn("n_words", size(col("toks")).cast("long"))
      // try_divide: an empty doc has n_words = 0 and both metrics are
      // NULL (DuckDB's x/0), not an ANSI divide-by-zero crash; the
      // n_words < 40 rule still fails the doc.
      .withColumn("mean_word_len",
        try_divide(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double"), col("n_words")))
      .withColumn("dup_frac",
        lit(1.0) - try_divide(
          size(array_distinct(col("toks"))).cast("double"), col("n_words")))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(col("toks")),
          typedLit(gopherStops))).cast("long"))
      .withColumn("fail_mask",
        when(col("n_words") < 40, 1L).otherwise(0L) +
          when(col("mean_word_len") < 3.8 || col("mean_word_len") > 10.0, 2L)
            .otherwise(0L) +
          when(col("dup_frac") > 0.55, 4L).otherwise(0L) +
          when(col("stop_hits") < 2, 8L).otherwise(0L))
      .select(col("doc_id") +: carry.map(col) :+ col("n_words") :+
        round(col("mean_word_len"), 6).as("mean_word_len") :+
        round(col("dup_frac"), 6).as("dup_frac") :+
        col("stop_hits") :+ col("fail_mask") :+
        (col("fail_mask") === 0L).cast("int").as("keep"): _*)

  /** Quality features for any (doc_id, text) frame. Public df-level API
    * (the q38 operator): pure rational arithmetic, scan-side. */
  def qualityScores(docs: DataFrame): DataFrame =
    docs
      .withColumn("len_c", length(col("text")).cast("double"))
      .withColumn("n_tok", size(split(col("text"), "\\s+")).cast("double"))
      // try_divide: zero-length text yields NULL ratios/score (DuckDB
      // x/0 semantics) rather than an ANSI divide-by-zero crash.
      // regexp_count, NOT length(regexp_replace(...)): both classes are
      // single-char, so the match count IS the removed-char count — the
      // same integer, exact as a double — but counting never
      // materializes a full cleaned copy of every document (two fewer
      // per-doc string allocations in the hottest scan; guide §1.2
      // per-task work). The DuckDB mirrors keep the length-diff form;
      // values are identical by the argument above.
      .withColumn("punct_ratio", try_divide(
        regexp_count(col("text"), lit(punctRe)).cast("double"), col("len_c")))
      .withColumn("upper_ratio", try_divide(
        regexp_count(col("text"), lit(upperRe)).cast("double"), col("len_c")))
      .withColumn("score", round(
        (col("n_tok") / (col("n_tok") + lit(100.0)))
          * (lit(1.0) - col("punct_ratio")) * (lit(1.0) - col("upper_ratio")), 6))

  /** Canonical fingerprints for any (doc_id, text) frame (q40). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("fp_full", md5(col("norm")))
      .withColumn("fp_prefix", md5(substring(col("norm"), 1, 64)))

  /** Gopher-style repetition signals for any (doc_id, text) frame (q65):
    * distinct-token ratio, duplicate 2/3-gram fractions, and immediate
    * token repeats. All computed per row with higher-order array
    * functions — scan-side, shuffle-free (an explode+groupBy formulation
    * would shuffle the whole gram stream to compute a per-doc stat).
    *
    * Tokens and n-grams are hashed to 64-bit xxhash64 values (codegen'd,
    * no string concat or digest allocation) before the distinct counts,
    * so `array_distinct` runs on primitive longs (OpenHashSet codegen
    * path) instead of pairwise string equality, and no gram string is
    * ever materialized. The oracle counts distinct gram STRINGS (ground
    * truth); the two agree unless a doc has an intra-document 64-bit
    * collision (~g²/2⁶⁵ ≈ 1e-9 for the corpus) — deterministic either
    * way, and the parity gate verifies equality on the actual data.
    * Pure rational arithmetic + round(6) keeps DuckDB parity exact.
    */
  def repetitionSignals(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      // slice guards keep 0/1-token docs from producing negative lengths
      .withColumn("tok_h", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("grams2_h", expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(x, i) -> xxhash64(x, toks[i + 1]))"))
      .withColumn("grams3_h", expr(
        "transform(slice(toks, 1, greatest(size(toks) - 2, 0)), " +
          "(x, i) -> xxhash64(x, toks[i + 1], toks[i + 2]))"))
      .withColumn("adj_repeats", expr(
        "cast(size(filter(slice(toks, 1, greatest(size(toks) - 1, 0)), (x, i) -> x = toks[i + 1])) as bigint)"))
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("tok_h"))).cast("double") / col("n_tok"), 6))
      // (total - distinct)/max(total,1): equals 1 - distinct/total for
      // non-empty gram arrays, 0 (not 1) for 0/1-token docs
      .withColumn("dup_2gram_ratio",
        round((size(col("grams2_h")) - size(array_distinct(col("grams2_h")))).cast("double")
          / greatest(size(col("grams2_h")), lit(1)), 6))
      .withColumn("dup_3gram_ratio",
        round((size(col("grams3_h")) - size(array_distinct(col("grams3_h")))).cast("double")
          / greatest(size(col("grams3_h")), lit(1)), 6))

  // PII patterns kept RE2-simple (no lookaround) so Spark's Java regex
  // and DuckDB's RE2 agree byte-for-byte.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "[0-9]{1,3}(\\.[0-9]{1,3}){3}"
  private val phoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"

  /** PII detection + redaction for any (doc_id, text) frame (q68):
    * count emails/IPv4s/phone-shaped spans, then redact in a fixed
    * order (email, ip, phone) to typed placeholders. Scan-side regex
    * inside codegen — the 100 TB shape is "scrub is a map", one pass,
    * no shuffle. Public df-level API. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("text"), lit(ipRe), lit(0))).cast("long"))
      .withColumn("clean", regexp_replace(regexp_replace(
        col("text"), emailRe, "[EMAIL]"), ipRe, "[IP]"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("clean"), lit(phoneRe), lit(0))).cast("long"))
      .withColumn("clean", regexp_replace(col("clean"), phoneRe, "[PHONE]"))
      .withColumn("clean_fp", md5(col("clean")))
      .withColumn("clean_len", length(col("clean")).cast("long"))

  /** documents with a deterministic PII footer appended to every 7th
    * doc — the synthetic corpus is PII-free, so q68 injects its own
    * (mirrored in the oracle) to give the scrubber real work. */
  private def docsWithPii(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    val footer = concat(lit(" Contact user"), col("doc_id").cast("string"),
      lit("@mail"), pmod(col("doc_id"), lit(10)).cast("string"),
      lit(".example.com or call +1-555-"),
      (pmod(col("doc_id"), lit(9000)) + 1000).cast("string"),
      lit(" from 192.168."), pmod(col("doc_id"), lit(256)).cast("string"),
      lit("."), pmod(col("doc_id"), lit(100)).cast("string"), lit("."))
    d.withColumn("text",
      when(col("doc_id") % 7 === 0, concat(col("text"), footer))
        .otherwise(col("text")))
  }
  // NB: no line may BEGIN with '||' — this snippet is re-embedded in a
  // stripMargin'd oracle string, which would eat the first pipe.
  private val piiDocsSql =
    """SELECT doc_id, lang, source,
      | CASE WHEN doc_id % 7 = 0 THEN text ||
      |   ' Contact user' || doc_id || '@mail' || (doc_id % 10) ||
      |   '.example.com or call +1-555-' || (doc_id % 9000 + 1000) ||
      |   ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100) || '.'
      | ELSE text END AS text
      |FROM documents""".stripMargin

  /** Deterministic stratified sampling (q66): keep a row iff a portable
    * md5-hex prefix of its id clears the stratum's rate threshold
    * (`"4000"` of `0x10000` = 1/4). Scan-side and shuffle-free — the
    * 100 TB story is "sampling is a filter", not a window/quota per
    * stratum (which would shuffle everything onto few stratum keys).
    * Rerun-stable across engines: same md5, same sample.
    */
  def stratifiedSample(docs: DataFrame,
      rateHex: org.apache.spark.sql.Column, salt: String = "strat"): DataFrame =
    docs
      .withColumn("h4",
        substring(md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))), 1, 4))
      .filter(col("h4") < rateHex)

  /** Sequence packing for training (q67): assign each doc to a
    * fixed-token-budget context window by running token count
    * (concat-then-chunk at doc granularity: pack = floor(tokens-before
    * / budget)).
    *
    * Packing is order-sensitive, so the stream is SHARDED first
    * (`doc_id % shards`): each (lang, shard) packs independently. A
    * bare `PARTITION BY lang` window would funnel 100 TB through ~5
    * partitions — the same low-cardinality-key mistake as the old q53
    * blocking. Shards keep window state bounded and the shuffle uniform;
    * at cluster scale you raise `shards`, not the partition count.
    */
  def packSequences(docs: DataFrame, budget: Int = 2048, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tok", size(split(col("text"), "\\s+")).cast("long"))
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / budget))
  }

  /** Sliding-window document chunking (q82): split each doc into
    * `window`-token chunks every `stride` tokens (overlap = window -
    * stride) — the standard long-document preprocessing ahead of
    * embedding/training (q78 pools exactly such chunks back into
    * parent features). Pure scan-side work: tokenize, explode the
    * start positions, slice — no shuffle at any corpus size; chunk
    * identity is (doc_id, chunk_idx) and `chunk_hash` is the portable
    * content hash of the space-joined chunk. */
  def chunkWindows(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame =
    docs
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("start_tok",
        explode(sequence(lit(0L), col("n") - 1, lit(stride.toLong))))
      .withColumn("chunk_toks",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(window)))
      .select(col("doc_id"),
        expr(s"start_tok div $stride").as("chunk_idx"),
        col("start_tok"),
        size(col("chunk_toks")).cast("long").as("n_tok"),
        graft.GraftSession.portableHash(array_join(col("chunk_toks"), " "))
          .as("chunk_hash"))

  /** Token-level Shannon entropy per doc (q95): low entropy flags
    * templated/near-constant text that the distinct-token RATIO alone
    * misses (a doc cycling 3 tokens has distinct_ratio≈0 but so does a
    * doc with one rare token repeated — entropy separates them by the
    * token DISTRIBUTION). Entropy = ln(n) − Σ c·ln(c) / n over
    * per-distinct-token counts c; `entropy_ratio` normalizes by the
    * max ln(n_distinct) so 1.0 = uniform usage.
    *
    * Scan-side higher-order array functions — a per-doc stat never
    * shuffles the token stream (explode+groupBy would). The Σ c·ln(c)
    * fold runs over the SORTED distinct token list in both engines
    * (Spark `aggregate`, DuckDB `list_reduce` — both strict left
    * folds), so the double op sequence is identical and round(6)
    * parity is exact by construction, not by FP luck. Cost is
    * O(distinct × n) per row, bounded by per-doc vocabulary. */
  def tokenEntropy(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      // the fold adds c·ln(c) terms in SORTED-distinct-token order with
      // plain addition: DuckDB's list_reduce seeds with the first
      // ELEMENT (no initial value), so the first term must already be
      // c·ln(c) on both sides for the op sequences to match.
      // r14 (guide §1.2 per-task work): run-length fold over the SORTED
      // token array — O(n log n) — replacing the per-distinct-token
      // `size(filter(toks, ...))` rescan, which was O(distinct × n) per
      // doc. Runs of equal tokens are contiguous after the sort, so
      // each run boundary adds the SAME c·ln(c) term in the SAME
      // (sorted-distinct) order as the old chain — the double op
      // sequence is unchanged, round(6) parity holds by construction,
      // and the oracle mirror is untouched.
      .withColumn("sum_clnc", expr(
        """aggregate(array_sort(toks),
          |  named_struct('p', cast(null as string),
          |    'c', cast(0 as bigint), 'acc', cast(0.0 as double)),
          |  (a, t) -> if(a.p is null or t != a.p,
          |    named_struct('p', t, 'c', cast(1 as bigint),
          |      'acc', if(a.p is null, a.acc,
          |        a.acc + cast(a.c as double) * ln(cast(a.c as double)))),
          |    named_struct('p', t, 'c', a.c + 1, 'acc', a.acc)),
          |  a -> if(a.p is null, a.acc,
          |    a.acc + cast(a.c as double) * ln(cast(a.c as double))))"""
          .stripMargin))
      .withColumn("entropy", round(
        log(col("n_tok").cast("double")) - col("sum_clnc") / col("n_tok"), 6))
      .withColumn("entropy_ratio", round(
        when(col("n_distinct") > 1,
          (log(col("n_tok").cast("double")) - col("sum_clnc") / col("n_tok"))
            / log(col("n_distinct").cast("double")))
          .otherwise(lit(0.0)), 6))

  /** Inverted-index materialization (q94): term → document frequency
    * plus the first `headSize` posting doc_ids, terms with
    * df < `minDf` dropped. ONE uniform term-key shuffle; the posting
    * list per term is bounded (`slice` of the sorted postings), so no
    * term's output row explodes regardless of how common the term is.
    * Array-typed df-level API; the gated query serializes it. */
  def invertedIndex(docs: DataFrame, headSize: Int, minDf: Long): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        slice(array_sort(collect_list(col("doc_id"))), 1, headSize)
          .as("postings_head"))
      .filter(col("df") >= minDf)

  /** Composite C4/Gopher-style keep/drop filter (q73): length,
    * punctuation, distinct-token and duplicate-2-gram gates evaluated
    * in ONE scan pass — [[repetitionSignals]] chained over
    * [[qualityScores]] adds columns to the same projection, so the
    * whole decision is a map with per-rule reject flags (no join of
    * two document scans, no shuffle). Public df-level API. */
  def qualityFilter(docs: DataFrame): DataFrame =
    repetitionSignals(qualityScores(docs))
      .withColumn("r_short", (col("n_tok") < 30).cast("int"))
      .withColumn("r_punct", (col("punct_ratio") > 0.08).cast("int"))
      .withColumn("r_repeat", (col("distinct_ratio") < 0.40).cast("int"))
      .withColumn("r_dup2", (col("dup_2gram_ratio") > 0.06).cast("int"))
      // AND chain, NOT a flag sum: an empty doc has punct_ratio NULL
      // (0-length denominator) so r_punct is NULL, and a sum would
      // poison keep to NULL — but FALSE AND NULL = FALSE, so any rule
      // that definitely fires still rejects the doc (oracle semantics).
      .withColumn("keep",
        (col("n_tok") >= 30 && col("punct_ratio") <= 0.08 &&
          col("distinct_ratio") >= 0.40 && col("dup_2gram_ratio") <= 0.06)
          .cast("int"))

  /** DuckDB mirror of [[qualityFilter]]'s flag ladder over an arbitrary
    * doc source (a table name or parenthesized subquery + alias) —
    * q73's oracle verbatim, and composable into the curation oracle
    * (q113), which applies it to a stage CTE instead of the raw table. */
  private[operators] def qualityFlagsSqlFrom(src: String): String =
    s"""SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       | CAST(n_tok < 30 AS INT) AS r_short,
       | CAST(punct_ratio > 0.08 AS INT) AS r_punct,
       | CAST(distinct_ratio < 0.40 AS INT) AS r_repeat,
       | CAST(dup_2gram_ratio > 0.06 AS INT) AS r_dup2,
       | CAST(n_tok >= 30 AND punct_ratio <= 0.08
       |   AND distinct_ratio >= 0.40 AND dup_2gram_ratio <= 0.06 AS INT) AS keep
       |FROM (
       |  SELECT doc_id, n_tok,
       |    ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok, 6) AS distinct_ratio,
       |    ROUND(CAST(len(grams2) - len(list_distinct(grams2)) AS DOUBLE)
       |      / greatest(len(grams2), 1), 6) AS dup_2gram_ratio,
       |    (CAST(LENGTH(text) AS DOUBLE)
       |      - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')))
       |      / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio
       |  FROM (
       |    SELECT doc_id, text, toks, len(toks) AS n_tok,
       |      list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1]) AS grams2
       |    FROM (SELECT doc_id, text,
       |        regexp_split_to_array(lower(text), '\\s+') AS toks
       |      FROM $src) qt) qg) qf""".stripMargin

  /** URL canonicalization — the pre-fetch/pre-dedup normalizer a
    * crawl pipeline runs so `http://Host.COM:80/p?b=2&a=1&utm_x=..#f`
    * and `http://host.com/p?a=1&b=2` count as ONE url. Syntax-based
    * normalization (RFC 3986 §6.2.2-.3): scheme and host lowercased,
    * default port stripped (:80 http / :443 https), empty path → "/",
    * fragment dropped; plus the operational extras every dedup stack
    * adds — tracking params (utm_*, fbclid, gclid, ref) removed and
    * the remaining query params SORTED (param order is almost never
    * semantic; sorting collapses emitter orderings). Non-URL strings
    * (no scheme) pass through unchanged. Pure scan-side codegen'd
    * Column — no shuffle, no UDF. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = split(u, "#").getItem(0)
    val base = split(noFrag, "\\?").getItem(0)
    val query = when(locate("?", noFrag) > 0,
      noFrag.substr(locate("?", noFrag) + 1, length(noFrag)))
    val scheme = lower(regexp_extract(base,
      "^([A-Za-z][A-Za-z0-9+.-]*)://.*$", 1))
    val auth = lower(regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*).*$", 1))
    val path = regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1)
    val auth2 = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path2 = when(path === "", lit("/")).otherwise(path)
    val kept = array_join(array_sort(filter(split(query, "&"),
      p => p =!= "" &&
        !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)"))), "&")
    val qstr = when(kept.isNull || kept === "", lit(""))
      .otherwise(concat(lit("?"), kept))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), auth2, path2, qstr))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_url_normalize" -> ((s, dir) => {
      // Canonicalization demo the gate can hash: deterministic raw
      // URLs fan out over case / default-port / tracking-param /
      // param-order / fragment variants; normalize collapses each
      // family to one canonical url. n_raw_variants counts the
      // distinct raw spellings that landed on each canonical form.
      val d = table(s, dir, "documents")
      val raw = concat(
        lit("HTTP://"),
        when(col("doc_id") % 4 === 0, lit("WWW.Example.COM:80"))
          .otherwise(lit("www.example.com")),
        lit("/docs/"), col("source"), lit("/"),
        (col("doc_id") % 25).cast("string"),
        when(col("doc_id") % 3 === 0, lit("?utm_source=crawler&b=2&a=1"))
          .when(col("doc_id") % 3 === 1, lit("?a=1&b=2"))
          .otherwise(lit("?b=2&a=1&utm_campaign=x")),
        when(col("doc_id") % 5 === 0, lit("#sec")).otherwise(lit("")))
      d.select(raw.as("raw"))
        .withColumn("norm_url", normalizeUrl(col("raw")))
        .groupBy(col("norm_url"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("raw")).as("n_raw_variants"))
        .orderBy(col("norm_url"))
    }),

    "q37_lang_id" -> ((s, dir) => {
      // Stopword-hit language ID, shuffle-free: per-language hit counts
      // via higher-order array functions on the token array (pure
      // scan-side map — an explode+groupBy would shuffle the whole
      // token stream), then argmax with fixed priority order.
      val hitCols = langs.map { l =>
        val set = stop(l).map(w => s"'$w'").mkString(", ")
        expr(s"size(filter(toks, t -> t IN ($set)))").as(s"c_$l")
      }
      val scored = table(s, dir, "documents")
        .withColumn("toks", split(lower(col("text")), "\\s+"))
        .select(col("doc_id") +: col("lang") +: hitCols: _*)
      val pred = langs.init.foldRight(lit(langs.last)) { (l, e) =>
        val c = col(s"c_$l")
        val ge = langs.filter(_ != l).map(o => c >= col(s"c_$o")).reduce(_ && _)
        when(ge, lit(l)).otherwise(e)
      }
      scored
        .withColumn("pred_lang", pred)
        .withColumn("is_correct", (col("pred_lang") === col("lang")).cast("int"))
        .select(col("doc_id"), col("lang"), col("pred_lang"), col("is_correct"))
        .orderBy(col("doc_id"))
    }),

    "q38_quality_score" -> ((s, dir) => {
      // Composite quality: token count saturation x (1 - punct ratio)
      // x (1 - uppercase ratio). Pure rational arithmetic.
      qualityScores(table(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_tok").cast("long").as("n_tok"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("upper_ratio"), 6).as("upper_ratio"), col("score"))
        .orderBy(col("doc_id"))
    }),

    "q39_token_count" -> ((s, dir) => {
      // Whitespace + BPE-ish regex token counts, rolled up per language.
      table(s, dir, "documents")
        .withColumn("n_ws", size(split(col("text"), "\\s+")).cast("long"))
        .withColumn("n_bpe", regexp_count(col("text"), lit(bpeRe)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws")).as("total_ws_tokens"),
          sum(col("n_bpe")).as("total_bpe_tokens"),
          round(sum(col("n_ws")).cast("double") / count(lit(1)), 6).as("avg_ws_tokens"))
        .orderBy(col("lang"))
    }),

    "q62_source_stats" -> ((s, dir) => {
      // Per-source corpus profile (provenance analytics): doc counts,
      // size stats, language spread.
      table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))
    }),

    "q57_vocab_topk" -> ((s, dir) => {
      // Corpus vocabulary head: token frequencies -> top 20. Explode is
      // scan-side; partial aggregation collapses the token stream
      // before the single shuffle; TakeOrdered for the head.
      table(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
    }),

    "q40_fingerprint" -> ((s, dir) => {
      // Canonicalize (lower, collapse whitespace) then fingerprint the
      // whole doc + a 64-char prefix window (cheap near-head rolling id).
      fingerprints(table(s, dir, "documents"))
        .select(col("doc_id"), col("fp_full"), col("fp_prefix"),
          length(col("norm")).as("norm_len"))
        .orderBy(col("doc_id"))
    }),

    "q65_repetition" -> ((s, dir) => {
      // Gopher-style repetition filters: low distinct-token ratio or a
      // high duplicate-n-gram fraction marks boilerplate/spam for
      // removal before training.
      repetitionSignals(table(s, dir, "documents"))
        .select(col("doc_id"), col("n_tok"), col("distinct_ratio"),
          col("dup_2gram_ratio"), col("dup_3gram_ratio"), col("adj_repeats"))
        .orderBy(col("doc_id"))
    }),

    "q66_stratified_sample" -> ((s, dir) => {
      // Deterministic stratified downsample: keep en at 1/4 and every
      // other language at 1/8, by portable hash threshold (no RNG, no
      // shuffle; the same rows survive on every engine and every run).
      val rate = when(col("lang") === "en", lit("4000")).otherwise(lit("2000"))
      stratifiedSample(table(s, dir, "documents"), rate)
        .select(col("doc_id"), col("lang"), col("source"), col("h4"))
        .orderBy(col("doc_id"))
    }),

    "q67_sequence_pack" -> ((s, dir) => {
      // Pack docs into 2048-token training windows per (lang, shard)
      // stream; report per-pack occupancy. Doc order inside a stream is
      // doc_id (deterministic); shards keep the windows parallel.
      packSequences(table(s, dir, "documents"))
        .groupBy(col("lang"), col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
        .orderBy(col("lang"), col("shard"), col("pack_id"))
    }),

    "q73_quality_filter" -> ((s, dir) => {
      // The pipeline's last gate: per-rule reject flags + the keep
      // decision, one scan-side pass, no shuffle but the output sort.
      qualityFilter(table(s, dir, "documents"))
        .select(col("doc_id"), col("n_tok"), col("r_short"),
          col("r_punct"), col("r_repeat"), col("r_dup2"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    "q68_pii_scrub" -> ((s, dir) => {
      // PII scrub before training: count + redact emails/IPs/phones.
      // One scan-side regex pass per doc; no shuffle but the final sort.
      piiScrub(docsWithPii(s, dir))
        .select(col("doc_id"), col("n_emails"), col("n_ips"),
          col("n_phones"), col("clean_len"), col("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    "q82_chunk_windows" -> ((s, dir) => {
      // Sliding-window chunking: 64-token chunks every 48 tokens
      // (16-token overlap) per document — scan-side tokenize + explode
      // + slice, shuffle-free at any corpus size.
      chunkWindows(table(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "q83_tfidf_keywords" -> ((s, dir) => {
      // TF-IDF keyword extraction: top-3 terms per doc by
      // tf * ln(N/df). Scale shape: tf is a map-side-combinable
      // (doc, term) aggregation; df is a VOCAB-sized table (<< corpus)
      // joined back on the uniform term key (AQE broadcasts it when
      // small); the top-3 is a per-doc window on the uniform doc key.
      // N rides a one-row broadcast agg (as q96 does) — no separate
      // driver-side count() action scanning the corpus twice.
      // Scores rounded to 6 dp BEFORE ranking so rank order is
      // cross-engine deterministic (term is the tiebreak).
      val docs = table(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = docs
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rk"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    "q85_reservoir_topk" -> ((s, dir) => {
      // Exact-k-per-stratum sampling (the "give me exactly 50 docs per
      // language" ask q66's rate-threshold cannot make exact): rank by
      // portable hash, keep the k smallest. Done in TWO phases because
      // lang is a low-cardinality key: a (lang, partition) pre-window
      // prunes each scan partition to its local top-k, so the final
      // per-lang window sees <= k * numPartitions rows, not the corpus
      // (the same sharding discipline as q67). The result is invariant
      // to partitioning — any local top-k superset contains the global
      // top-k.
      val k = 50
      val docs = table(s, dir, "documents")
        .withColumn("hk",
          md5(concat(lit("res:"), col("doc_id").cast("string"))))
      val pre = Window.partitionBy(col("lang"), col("pid"))
        .orderBy(col("hk"), col("doc_id"))
      val fin = Window.partitionBy(col("lang"))
        .orderBy(col("hk"), col("doc_id"))
      docs
        .withColumn("pid", spark_partition_id())
        .withColumn("prk", row_number().over(pre))
        .filter(col("prk") <= k)
        .withColumn("rk", row_number().over(fin).cast("long"))
        .filter(col("rk") <= k)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    "q86_histogram" -> ((s, dir) => {
      // Fixed-width value histogram (profiling): single scan-side pass,
      // bucket = floor(value / width) — no data-dependent bounds pass,
      // map-side-combinable aggregation on a bounded key space.
      table(s, dir, "orders")
        .withColumn("bucket",
          floor(col("o_totalprice") / 30000.0).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          graft.GraftSession.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("bucket"))
    }),

    "q94_inverted_index" -> ((s, dir) => {
      // Inverted-index materialization (search over the corpus): term
      // -> document frequency + the first 5 posting doc_ids. One
      // uniform term-key shuffle; posting lists are built per term
      // with bounded output (head of the sorted postings), so no
      // term's row explodes. Terms with df < 3 dropped (hapax noise).
      // The gated output comma-joins the posting head: the driver's
      // oracle harness can't hash array cells, and bigint→string
      // rendering is identical across engines. invertedIndex keeps the
      // array-typed API.
      invertedIndex(table(s, dir, "documents"), headSize = 5, minDf = 3)
        .select(col("term"), col("df"),
          array_join(col("postings_head").cast("array<string>"), ",")
            .as("postings_head"))
        .orderBy(col("term"))
    }),

    "q95_token_entropy" -> ((s, dir) => {
      // Shannon-entropy quality signal: per-doc token distribution
      // entropy + the uniformity ratio. Scan-side, shuffle-free but the
      // output sort (see tokenEntropy for the cross-engine fold rules).
      tokenEntropy(table(s, dir, "documents"))
        .select(col("doc_id"), col("n_tok"), col("n_distinct"),
          col("entropy"), col("entropy_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q96_bm25" -> ((s, dir) => {
      // BM25 ranking — the retrieval face of q94's inverted index:
      // score every doc against a fixed 3-term query, keep the top 10.
      // Scale shape: tf per term is a scan-side filter count (the
      // token stream never explodes or shuffles); N / avgdl / df are
      // ONE tiny agg row broadcast back; the ranking is a global
      // top-k (TakeOrdered), not a full sort. Scores sum in a fixed
      // term order and round(6) BEFORE ranking; doc_id breaks ties —
      // rank order is cross-engine deterministic.
      val k1 = 1.2
      val b = 0.75
      val terms = Seq("spark", "query", "fast")
      val d = table(s, dir, "documents")
        .withColumn("toks", split(lower(col("text")), "\\s+"))
        .withColumn("dl", size(col("toks")).cast("double"))
      val withTf = terms.foldLeft(d) { (df, t) =>
        df.withColumn(s"tf_$t",
          expr(s"cast(size(filter(toks, x -> x = '$t')) as double)"))
      }
      val aggCols = count(lit(1)).cast("double").as("n_docs") +:
        (sum(col("dl").cast("long")).cast("double") / count(lit(1)))
          .as("avgdl") +:
        terms.map(t =>
          sum((col(s"tf_$t") > 0).cast("long")).cast("double").as(s"df_$t"))
      val stats = withTf.agg(aggCols.head, aggCols.tail: _*)
      val score = terms.map { t =>
        val idf = log(lit(1.0) +
          (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
        // constants as decimal literals (2.2, 0.25), NOT Scala arithmetic
        // (k1+1, 1-b): the oracle parses the same literals, and e.g.
        // 1.2+1.0 in double can land an ulp away from parsed "2.2"
        idf * (col(s"tf_$t") * lit(2.2)) /
          (col(s"tf_$t") + lit(k1) * (lit(0.25) + lit(b) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      withTf.crossJoin(broadcast(stats))
        .withColumn("score", round(score, 6))
        .filter(col("score") > 0)
        .select(col("doc_id") +:
          terms.map(t => col(s"tf_$t").cast("long").as(s"tf_$t")) :+
          col("score"): _*)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    }),

    "q111_winnowing" -> ((s, dir) => {
      // MOSS-style winnowing fingerprints (Schleimer et al.): hash
      // every 3-word gram portably, slide a window of 4 consecutive
      // gram hashes, keep each window's MINIMUM — the guarantee is
      // that any shared run of ≥6 tokens between two docs shares a
      // print, with ~1/4 the storage of full gram sets. Entirely
      // scan-side higher-order folds (no explode of the gram stream,
      // no shuffle); the gated output comma-joins the sorted distinct
      // prints (the driver gate can't hash array cells). Docs under 6
      // tokens have no full window and are excluded on both sides.
      // r8: the tokenize→gram-md5→window-min→sort-distinct chain runs
      // as ONE native pass (functions/WinnowPrints.scala) — byte-
      // faithful to the declarative HOF chain it replaced (same
      // lowercase, split, md5 arithmetic), so the oracle is untouched;
      // docs under 6 tokens return an empty array (== the old
      // size(toks) >= 6 filter).
      table(s, dir, "documents")
        .withColumn("prints", call_function("winnow_prints", col("text")))
        .filter(size(col("prints")) > 0)
        .select(col("doc_id"),
          size(col("prints")).cast("long").as("n_prints"),
          array_join(col("prints").cast("array<string>"), ",").as("prints"))
        .orderBy(col("doc_id"))
    }),

    "q112_winnow_matches" -> ((s, dir) => {
      // Winnowing match detection (q111's retrieval face, the MOSS
      // report): doc pairs sharing ≥2 winnowed prints. Prints carry
      // ~¼ of the gram set, so candidate pairing is ~16× cheaper than
      // raw-gram matching; prints seen in >20 docs are dropped first
      // (stop-prints — boilerplate phrases otherwise make one print
      // bucket quadratic, exactly MOSS's own common-fingerprint cull),
      // bounding every join bucket at 20·19/2 pairs.
      // r8: same native winnow_prints pass as q111 (explode of the
      // empty array drops sub-6-token docs, preserving the row set)
      val prints = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(call_function("winnow_prints", col("text"))).as("print"))
      val rare = prints.groupBy(col("print"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= 20)
        .select(col("print"))
      val kept = prints.join(rare, "print")
      val a = kept.select(col("print"), col("doc_id").as("doc_a"))
      val b = kept.select(col("print"), col("doc_id").as("doc_b"))
      a.join(b, a("print") === b("print") && col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q109_char_lm_score" -> ((s, dir) =>
      charLmScores(table(s, dir, "documents")).orderBy(col("doc_id"))),

    "q148_bm25_search" -> ((s, dir) => {
      // Batch BM25 retrieval — the decontamination/eval-retrieval
      // workload: score a SET of queries in one corpus pass via the
      // posting-list join (q96 scores one fixed query with per-term
      // columns; this is the shape that scales in |queries|). Scale:
      // the tiny query-term table BROADCASTs against the postings, so
      // only matched-term postings survive the first join; df/stats
      // are term-count-sized broadcasts; per-(query,doc) re-agg is
      // map-side combinable; top-5/query is one per-query window.
      // Cross-engine exactness: per-TERM scores round to integer
      // micro-units before the per-doc sum (integer sums are order-
      // independent), and ranking orders on the integer score —
      // no double-accumulation drift anywhere.
      import s.implicits._
      val queriesDf = Seq((1L, "spark join fast"),
        (2L, "window agg stream"), (3L, "customer order value"))
        .toDF("query_id", "qtext")
      val qterms = queriesDf.select(col("query_id"),
        explode(split(col("qtext"), " ")).as("term"))
      val d = table(s, dir, "documents")
        .withColumn("toks", split(lower(col("text")), "\\s+"))
        .withColumn("dl", size(col("toks")).cast("double"))
      val postings = d
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl").cast("long")).cast("double") / count(lit(1)))
          .as("avgdl"))
      val matched = postings
        .join(broadcast(qterms.select(col("term")).distinct()), "term")
      val dft = matched.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("df"))
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val tfPart = (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      val perDoc = matched
        .join(broadcast(qterms), "term")
        .join(broadcast(dft), "term")
        .crossJoin(broadcast(stats))
        .withColumn("sfp",
          round((idf * tfPart) * lit(1000000.0), 0).cast("long"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("sfp")).as("score_fp"),
          count(lit(1)).as("n_terms_hit"))
      // Top-5 per query via the native bounded heap: a common term can
      // put most of the corpus in one query's candidate set, and a
      // query_id-partitioned window would sort all of it on one
      // reducer; groupTopK moves ≤ 5 rows per (query, partition).
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_fp").desc, col("doc_id"))
      TopK.groupTopK(perDoc, Seq("query_id"),
          Seq(("score_fp", true), ("doc_id", false)), 5)
        .withColumn("rk", row_number().over(w))
        .select(col("query_id"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("n_terms_hit"),
          round(col("score_fp").cast("double") / lit(1000000.0), 6)
            .as("score"))
        .orderBy(col("query_id"), col("rk"))
    }),

    "q145_gopher_rules" -> ((s, dir) => {
      // Gopher/MassiveText-style rule filter (Rae et al. 2021 §A1.1):
      // per-doc hard quality rules — word count, mean word length,
      // duplicate-word fraction, stopword containment — emitted as a
      // fail BITMASK so downstream can both filter (mask=0) and
      // audit WHICH rule fired (the published recipe reports per-rule
      // removal rates; q143-style dashboards aggregate this mask).
      // Thresholds adapted to the synthetic corpus so every rule
      // discriminates (wc≥40 fails ~34%, dup≤0.55 ~48%, stop≥2 ~37%,
      // mwl∈[3.8,10] rare). Entirely scan-side higher-order folds —
      // no explode, no join, no shuffle but the output sort; the
      // rational arithmetic (single int/int divisions) is bit-
      // identical cross-engine, so the gate is per-doc hash-exact.
      gopherRules(table(s, dir, "documents")).orderBy(col("doc_id"))
    }),

    "q183_pmi_collocations" -> ((s, dir) => {
      // Collocation extraction: top word pairs by pointwise mutual
      // information within a 5-token window — the phrase-detection
      // statistic (word2vec's phrase pass, tokenizer multi-word vocab
      // candidates). PMI assembles from four exact integers
      // (ln(n_ab·N/(n_a·n_b))); a min-count floor (n_ab ≥ 20) kills
      // the hapax-pair explosion PMI is notorious for. Scale: the
      // window pair join is per-DOC (uniform key) with fan-out ≤ 4
      // per token; pair counts map-side combine.
      val toks = table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      val n = toks.agg(count(lit(1)).as("n_total"))
      val tc = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
      val pairs = toks.as("a").join(toks.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 4)
        .groupBy(col("a.tok").as("w1"), col("b.tok").as("w2"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 20)
      // tc is VOCAB-sized (corpus-dependent, unbounded) — no broadcast
      // hint; AQE broadcasts it when small, shuffles it when not (the
      // q83 rule). Only the 1-row total is force-broadcast.
      pairs
        .join(tc.select(col("tok").as("w1"), col("n_tok").as("n1")),
          Seq("w1"))
        .join(tc.select(col("tok").as("w2"), col("n_tok").as("n2")),
          Seq("w2"))
        .crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("n_pair"),
          round(log((col("n_pair").cast("double") * col("n_total")) /
            (col("n1").cast("double") * col("n2"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    "q184_next_word_suggest" -> ((s, dir) => {
      // The autocomplete table: for each of the corpus's 20 most
      // frequent words, its top-3 next-word continuations — adjacent
      // bigram counts ranked through the NATIVE group-top-k plan
      // (A34), so the continuation shuffle carries ≤3 rows per (head,
      // partition) instead of every bigram. Total (count desc, word)
      // order ⇒ hash-exact.
      val toks = table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      val heads = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
        .orderBy(col("n_tok").desc, col("tok")).limit(20)
        .select(col("tok").as("w1"))
      val bigrams = toks.as("a").join(toks.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.pos") === col("a.pos") + 1)
        .groupBy(col("a.tok").as("w1"), col("b.tok").as("w2"))
        .agg(count(lit(1)).as("n"))
        .join(broadcast(heads), Seq("w1"))
      TopK.groupTopK(bigrams, group = Seq("w1"),
        order = Seq(("n", true), ("w2", false)), k = 3)
        .orderBy(col("w1"), col("n").desc, col("w2"))
    }),

    "q182_rule_firing_matrix" -> ((s, dir) => {
      // Per-source rule-firing rates: which q145 Gopher rule removes
      // what, where — the per-rule removal-rate table the MassiveText
      // paper itself publishes, pivoted by source so a rule that
      // disproportionately fires on ONE source (boilerplate farm, or
      // a rule miscalibrated for a domain) is visible per snapshot.
      // Rates from exact integer bitmask tests; one rules scan +
      // a |sources|-row agg.
      val r = gopherRules(table(s, dir, "documents"), carry = Seq("source"))
      r.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(expr("fail_mask & 1")).cast("double") /
            count(lit(1)), 6).as("r_wordcount"),
          round(sum(expr("(fail_mask >> 1) & 1")).cast("double") /
            count(lit(1)), 6).as("r_wordlen"),
          round(sum(expr("(fail_mask >> 2) & 1")).cast("double") /
            count(lit(1)), 6).as("r_dupwords"),
          round(sum(expr("(fail_mask >> 3) & 1")).cast("double") /
            count(lit(1)), 6).as("r_stopwords"),
          round(sum(col("keep").cast("long")).cast("double") /
            count(lit(1)), 6).as("keep_rate"))
        .orderBy(col("source"))
    }),

    "q180_char_entropy" -> ((s, dir) => {
      // Character-level Shannon entropy per doc — the compressibility
      // proxy that catches what token-level screens miss: base64
      // blobs and hex dumps score HIGH (≈ ln alphabet), stuck-key
      // repetition scores near 0, natural text sits ~2.8–3.2 nats —
      // so both tails are removal candidates. Per-term contributions
      // round to nano-units and sum as integers (order-independent
      // ⇒ hash-exact). Scale: the (doc, char) explode map-side
      // combines to ≤|alphabet| rows per doc per task before the one
      // uniform shuffle.
      val chars = table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      val n = chars.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
      chars.join(n, "doc_id")
        .select(col("doc_id"), col("n"), col("n_distinct"),
          round((col("c").cast("double") / col("n")) *
            log(col("n").cast("double") / col("c")) * lit(1e9), 0)
            .cast("long").as("t"))
        .groupBy(col("doc_id"), col("n"), col("n_distinct"))
        .agg(sum(col("t")).as("h_fp"))
        .select(col("doc_id"), col("n").as("n_chars"), col("n_distinct"),
          round(col("h_fp") / lit(1e9), 6).as("entropy_nats"))
        .withColumn("suspicious",
          col("entropy_nats") < 2.0 || col("entropy_nats") > 4.2)
        .orderBy(col("doc_id"))
    }),

    "q177_quality_calibration" -> ((s, dir) => {
      // Filter-vs-scorer calibration: Gopher keep rate per char-LM
      // score quintile — if the hard rules (q145) and the LM scorer
      // (q109) rank quality consistently, keep_rate should rise
      // monotonically toward the head quintile; a flat profile means
      // the two signals disagree and the pipeline is filtering on
      // noise. Composes the two GATED signals (oracle string-shares
      // both CTE sets) — the per-snapshot sanity check a curation
      // stack runs before trusting either. Quintiles over the ROUNDED
      // score (identical doubles cross-engine) with doc_id tie-break;
      // mean score sums exactly in decimal.
      // Quintile assignment is a GLOBAL per-doc rank: an unpartitioned
      // ntile window would funnel the whole corpus through one reducer
      // at 100 TB, so the rank comes from ShardedCum's range-sharded
      // prefix count and the bucket is arithmetic off (rank, n).
      val docs = table(s, dir, "documents")
      val sc = charLmScores(docs).select(col("doc_id"), col("avg_logp"))
      val keep = gopherRules(docs).select(col("doc_id"), col("keep"))
      // ckpt (r15, guide §1.2): three consumers — the rank's
      // range-sampling pass, its shard-pinning ckpt, and the nTot
      // count — would otherwise each re-run the char-LM scoring and
      // gopher-rule join; materialize the 3-column frame once.
      val scored = graft.GraftSession.ckpt(sc.join(keep, "doc_id"))
      val nTot = scored.agg(count(lit(1)).as("_n"))
      ShardedCum.globalRank(scored,
          Seq(col("avg_logp").desc, col("doc_id")), "_rn")
        .crossJoin(broadcast(nTot))
        .withColumn("quintile", ShardedCum.ntileFromRank("_rn", "_n", 5))
        .groupBy(col("quintile"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("avg_logp").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("mean_logp"),
          round(sum(col("keep").cast("long")).cast("double") /
            count(lit(1)), 6).as("keep_rate"))
        .orderBy(col("quintile"))
    }),

    "q144_ccnet_buckets" -> ((s, dir) => {
      // CCNet-style quality bucketing (Wenzek et al. 2020): rank each
      // language's docs by the q144-shared char-LM score and cut into
      // head/middle/tail terciles — the published recipe for
      // perplexity-stratified pretraining corpora (train on head,
      // sample middle, drop tail). Bucketing is per-LANG ntile over
      // the ROUNDED score (identical doubles both engines; doc_id
      // tie-break), so bucket membership is deterministic. Scale
      // shape: scoring is q109's two-phase broadcast design; the
      // tercile rank comes from ShardedCum's range-sharded per-lang
      // prefix count (a `Window.partitionBy(lang)` ntile would sort a
      // dominant language's whole corpus on ONE reducer — the q48
      // funnel class), with the bucket as arithmetic off (rank, n).
      // CCNet itself cuts on ppl thresholds learned from a SAMPLE;
      // approx-quantile cuts remain the sketch alternative, but the
      // sharded exact rank already removes the global sort. The gated
      // report is per (lang, bucket): count + mean/extreme scores.
      val docs = table(s, dir, "documents")
      // ckpt (r15, guide §1.2): the scored frame feeds the rank's
      // range-sampling pass, its shard-pinning ckpt AND the per-lang
      // counts — without the pin each re-runs the char-LM scoring join.
      val scored = graft.GraftSession.ckpt(
        docs.select(col("doc_id"), col("lang"))
          .join(charLmScores(docs), "doc_id")
          .select(col("doc_id"), col("lang"), col("avg_logp")))
      val withRn = ShardedCum.cumSums(scored, Seq("lang"),
        Seq(col("avg_logp").desc, col("doc_id")), Seq((lit(1L), "_rn")))
      val counts = scored.groupBy(col("lang")).agg(count(lit(1)).as("_n"))
      withRn.join(broadcast(counts), Seq("lang"))
        .withColumn("bucket", ShardedCum.ntileFromRank("_rn", "_n", 3))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("avg_logp")), 6).as("mean_logp"),
          max(col("avg_logp")).as("best_logp"),
          min(col("avg_logp")).as("worst_logp"))
        .orderBy(col("lang"), col("bucket"))
    }),

    "q102_heavy_hitters" -> ((s, dir) => {
      // One-pass sketch top-10 tokens via the Misra-Gries aggregate:
      // unlike q57's exact groupBy+rank (which shuffles the WHOLE
      // token stream on the token key), the sketch shuffles 64
      // counters per map task — the q88-style sketch rung of the vocab
      // ladder. Rows-only gate BY DESIGN: borderline counter values
      // are merge-order-dependent (the error bounds are not —
      // FreqTopKAggSpec asserts them against exact counts); the top-10
      // emission is a stable 10-row surface.
      // MEMBERSHIP contract (the sketch's, not just the values'): MG
      // only guarantees an item is present when its true frequency
      // exceeds n/(capacity+1) = n/65. When the 10th and 11th items
      // have closer true frequencies than the counters' merge-order
      // jitter, WHICH of them is emitted can differ across
      // runs/partitionings — rank-boundary membership is approximate
      // by the sketch contract. Every emitted (term, est_count) still
      // satisfies est <= f(term) <= est + n/65 regardless; callers
      // needing stable boundary membership should over-fetch from the
      // sketch (e.g. top-20) and cut on the exact counts of that
      // shortlist.
      // IN-ARTIFACT EVIDENCE (r4 verdict ask #7): the gated query
      // carries its own bound check — exact counts of the 10 EMITTED
      // terms (scan + 10-key broadcast semi-join, never a full-vocab
      // shuffle) and n from the same single sketch pass, with
      // out-of-bounds rows FILTERED so a sketch regression surfaces as
      // a row-count drop in the rows-only gate. The evidence join adds
      // a second corpus scan this query wouldn't otherwise need —
      // production callers use freq_topk_agg directly; this gated
      // shape is the evidence harness.
      val tokens = table(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("term"))
      // ckpt: 10 rows; both consumers below reuse one sketch pass
      val top = ckpt(tokens
        .agg(expr("freq_topk_agg(term, 64)").as("hh"),
          count(lit(1)).as("n_total"))
        .select(explode(col("hh")).as("e"), col("n_total"))
        .select(col("e.item").as("term"), col("e.est_count").as("est_count"),
          col("n_total"))
        .orderBy(col("est_count").desc, col("term"))
        .limit(10))
      val exact = tokens.join(broadcast(top.select(col("term"))), Seq("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("exact_count"))
      top.join(broadcast(exact), Seq("term"))
        .withColumn("within_bounds",
          col("est_count") <= col("exact_count") &&
            col("exact_count") - col("est_count") <= col("n_total") / lit(65))
        .filter(col("within_bounds"))
        .select(col("term"), col("est_count"), col("exact_count"),
          col("within_bounds"))
        .orderBy(col("est_count").desc, col("term"))
    }),

    "q156_cms_heavy" -> ((s, dir) => {
      // Count-min sketch rung of the vocab ladder (Cormode &
      // Muthukrishnan 2005), complementing q102's Misra-Gries: MG
      // keeps the top-k identities; CMS answers point frequency for
      // ANY term off a fixed 4×512 integer grid. The sketch builds
      // DIRECTLY from the token stream — the (r, bucket) partial aggs
      // collapse to ≤2048 cells per map task, so the sketch shuffle is
      // O(grid), never O(vocab): exactly why a 100 TB pipeline keeps a
      // CMS when it can't afford the vocabulary shuffle. Unlike MG,
      // the cell values are merge-order INDEPENDENT (plain sums), so
      // this gate is hash-exact, not rows-only. The exact top-20 join
      // is the evidence harness (q102 pattern): est >= exact per the
      // CMS one-sided guarantee, overshoot published per term.
      // the 4 row-hashes are the 4 disjoint 32-bit slices of ONE md5
      // digest per term (not 4 digests): same independence class,
      // quarter the hash cost on the hot stream
      val tokens = table(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("term"))
      def buckets(term: Column): Column = {
        val h = md5(term)
        array((0 until 4).map(r =>
          pmod(conv(substring(h, 1 + 8 * r, 8), 16, 10).cast("long"),
            lit(512L))): _*)
      }
      val sketch = tokens
        .select(posexplode(buckets(col("term"))).as(Seq("r", "bucket")))
        .groupBy(col("r"), col("bucket"))
        .agg(count(lit(1)).as("cell"))
      val top = ckpt(tokens.groupBy(col("term"))
        .agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("term")).limit(20))
      top.select(col("term"), col("exact_count"),
          posexplode(buckets(col("term"))).as(Seq("r", "bucket")))
        .join(broadcast(sketch), Seq("r", "bucket"))
        .groupBy(col("term"), col("exact_count"))
        .agg(min(col("cell")).as("est_count"))
        .withColumn("overshoot", col("est_count") - col("exact_count"))
        .filter(col("est_count") >= col("exact_count"))
        .select(col("term"), col("exact_count"), col("est_count"),
          col("overshoot"))
        .orderBy(col("exact_count").desc, col("term"))
    }),

    "q100_domain_cap" -> ((s, dir) => {
      // Per-source quota curation: each source keeps at most its 30
      // best documents (longest first — the stand-in quality rank —
      // doc_id as the deterministic tiebreak), through the native
      // bounded-heap groupTopK: ≤ 30 rows per (source, partition)
      // cross the exchange, where a source-partitioned window would
      // sort a hot domain's whole corpus on ONE reducer. The rank
      // window that numbers the survivors sees ≤ 30×|sources| rows;
      // rank emitted so the oracle pins ordering, not just membership.
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      TopK.groupTopK(
          table(s, dir, "documents")
            .select(col("source"), col("doc_id"), col("n_chars")),
          Seq("source"), Seq(("n_chars", true), ("doc_id", false)), 30)
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(col("source"), col("doc_id"), col("n_chars"), col("rk"))
        .orderBy(col("source"), col("rk"))
    }),

    "q71_domain_mix" -> ((s, dir) => {
      // Target-mixture resampling: uniform share per source. Keep rate
      // per source = min(1, total/num_sources/n_source); the keep
      // decision is a portable-hash threshold (sampling stays a FILTER;
      // the only shuffle is the 20-row source-count aggregate that gets
      // broadcast back).
      // total/n_sources ride a 1-row broadcast cross-join rather than
      // empty-partition windows: Window.partitionBy() would funnel the
      // counts frame through one reducer, and at domain granularity
      // that frame is millions of rows.
      val docs = table(s, dir, "documents")
      val counts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_src"))
      val totals = counts.agg(sum(col("n_src")).as("total"),
        count(lit(1)).cast("double").as("n_sources"))
      val withTotal = counts.crossJoin(broadcast(totals))
        .withColumn("keep_rate", least(lit(1.0),
          col("total") / col("n_sources") / col("n_src")))
        .select(col("source"), col("n_src"), col("keep_rate"))
      docs.join(broadcast(withTotal), "source")
        .withColumn("h", graft.GraftSession.portableHash(
          concat(lit("mix:"), col("doc_id").cast("string"))))
        .filter(col("h").cast("double") < col("keep_rate") * 4294967296.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          max(round(col("keep_rate"), 6)).as("keep_rate"))
        .orderBy(col("source"))
    })
  )

  /** q109's scoring CTEs (ends in a `scored(doc_id, n_bigrams,
    * avg_logp)` CTE), string-shared by the q109 and q144 oracles. */
  private val charLmScoreCtes =
    """t AS (
      |  SELECT doc_id, lower(text) AS lt FROM documents
      |  WHERE length(text) >= 2),
      |bgs AS (
      |  SELECT doc_id, substr(lt, CAST(i AS INTEGER), 2) AS bg
      |  FROM t, UNNEST(generate_series(1, length(lt) - 1)) AS u(i)),
      |model AS (SELECT bg, COUNT(*) AS c FROM bgs GROUP BY bg),
      |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM model),
      |scored AS (
      |  SELECT b.doc_id, COUNT(*) AS n_bigrams,
      |    ROUND(AVG(LN(m.c / t.total)), 6) AS avg_logp
      |  FROM bgs b JOIN model m USING (bg) CROSS JOIN tot t
      |  GROUP BY b.doc_id)""".stripMargin

  /** The q145 Gopher-rule CTEs (toks → features → fail_mask), shared
    * so composed mirrors (q165 filter-bias PSI) provably apply the
    * SAME rules the q145 gate checks. Final CTE `m` exposes
    * (doc_id, n_words, mwl, dupf, stop_hits, fail_mask). */
  private[operators] val gopherCtes: String =
    """d AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      t -> length(t) >= 1) AS toks
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |      / len(toks) AS mwl,
      |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dupf,
      |    CAST(len(list_intersect(list_distinct(toks),
      |      ['the','a','of','to','and','in','is'])) AS BIGINT) AS stop_hits
      |  FROM d),
      |m AS (
      |  SELECT doc_id, n_words, mwl, dupf, stop_hits,
      |    (CASE WHEN n_words < 40 THEN 1 ELSE 0 END
      |     + CASE WHEN mwl < 3.8 OR mwl > 10.0 THEN 2 ELSE 0 END
      |     + CASE WHEN dupf > 0.55 THEN 4 ELSE 0 END
      |     + CASE WHEN stop_hits < 2 THEN 8 ELSE 0 END) AS fail_mask
      |  FROM f)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q127_url_normalize" ->
      """WITH rw AS (
        |  SELECT 'HTTP://' ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.Example.COM:80'
        |         ELSE 'www.example.com' END ||
        |    '/docs/' || source || '/' || CAST(doc_id % 25 AS VARCHAR) ||
        |    CASE doc_id % 3 WHEN 0 THEN '?utm_source=crawler&b=2&a=1'
        |      WHEN 1 THEN '?a=1&b=2' ELSE '?b=2&a=1&utm_campaign=x' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS raw
        |  FROM documents),
        |p1 AS (SELECT raw, split_part(raw, '#', 1) AS nofrag FROM rw),
        |p2 AS (
        |  SELECT raw, split_part(nofrag, '?', 1) AS base,
        |    CASE WHEN position('?' IN nofrag) > 0
        |      THEN substr(nofrag, position('?' IN nofrag) + 1) END AS query
        |  FROM p1),
        |p3 AS (
        |  SELECT raw,
        |    lower(regexp_extract(base,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://.*$', 1)) AS scheme,
        |    lower(regexp_extract(base,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*).*$', 1)) AS auth,
        |    regexp_extract(base,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$', 1) AS path,
        |    query
        |  FROM p2),
        |p4 AS (
        |  SELECT raw, scheme,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |         ELSE auth END AS auth2,
        |    CASE WHEN path = '' THEN '/' ELSE path END AS path2,
        |    COALESCE(array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      x -> x <> '' AND NOT regexp_matches(x,
        |        '^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))), '&'), '') AS kept
        |  FROM p3),
        |n AS (
        |  SELECT raw,
        |    CASE WHEN scheme = '' THEN raw
        |      ELSE scheme || '://' || auth2 || path2 ||
        |        CASE WHEN kept = '' THEN '' ELSE '?' || kept END
        |    END AS norm_url
        |  FROM p4)
        |SELECT norm_url, COUNT(*) AS n_urls,
        |  COUNT(DISTINCT raw) AS n_raw_variants
        |FROM n GROUP BY norm_url ORDER BY norm_url""".stripMargin,

    "q37_lang_id" -> {
      val hits = langs.map { l =>
        val set = stop(l).map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($set))) AS c_$l"
      }.mkString(", ")
      val pred = {
        def clause(l: String) = {
          val ge = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
          s"WHEN $ge THEN '$l'"
        }
        s"CASE ${langs.init.map(clause).mkString(" ")} ELSE '${langs.last}' END"
      }
      s"""WITH scored AS (
         |  SELECT doc_id, lang, $hits
         |  FROM (SELECT doc_id, lang,
         |          regexp_split_to_array(lower(text), '\\s+') AS toks
         |        FROM documents))
         |SELECT doc_id, lang, $pred AS pred_lang,
         | CAST(($pred = lang) AS INT) AS is_correct
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    "q38_quality_score" ->
      s"""WITH m AS (
         |  SELECT doc_id, lang,
         |    CAST(LENGTH(text) AS DOUBLE) AS len_c,
         |    CAST(LEN(regexp_split_to_array(text, '\\s+')) AS DOUBLE) AS n_tok,
         |    (CAST(LENGTH(text) AS DOUBLE) - LENGTH(regexp_replace(text, '$punctRe', '', 'g')))
         |      / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
         |    (CAST(LENGTH(text) AS DOUBLE) - LENGTH(regexp_replace(text, '$upperRe', '', 'g')))
         |      / CAST(LENGTH(text) AS DOUBLE) AS upper_ratio
         |  FROM documents)
         |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
         | ROUND(punct_ratio, 6) AS punct_ratio,
         | ROUND(upper_ratio, 6) AS upper_ratio,
         | ROUND((n_tok / (n_tok + 100.0)) * (1.0 - punct_ratio) * (1.0 - upper_ratio), 6) AS score
         |FROM m ORDER BY doc_id""".stripMargin,

    "q39_token_count" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         | CAST(SUM(LEN(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_ws_tokens,
         | CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_bpe_tokens,
         | ROUND(CAST(SUM(LEN(regexp_split_to_array(text, '\\s+'))) AS DOUBLE) / COUNT(*), 6) AS avg_ws_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q62_source_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        | COUNT(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q57_vocab_topk" ->
      """SELECT tok, COUNT(*) AS n FROM (
        |  SELECT UNNEST(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,

    // CMS cells are plain md5-bucketed sums — merge-order independent,
    // so the whole sketch mirrors exactly in SQL (unlike Misra-Gries).
    "q156_cms_heavy" ->
      """WITH tk AS (
        |  SELECT UNNEST(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents),
        |cells AS (
        |  SELECT rs.r,
        |    ('0x' || substr(md5(term), 1 + 8 * rs.r, 8))::BIGINT % 512
        |      AS bucket,
        |    COUNT(*) AS cell
        |  FROM tk CROSS JOIN (VALUES (0), (1), (2), (3)) AS rs(r)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT term, COUNT(*) AS exact_count FROM tk GROUP BY term
        |  ORDER BY exact_count DESC, term LIMIT 20),
        |probes AS (
        |  SELECT t.term, t.exact_count, rs.r,
        |    ('0x' || substr(md5(t.term), 1 + 8 * rs.r, 8))::BIGINT % 512
        |      AS bucket
        |  FROM top t CROSS JOIN (VALUES (0), (1), (2), (3)) AS rs(r)),
        |est AS (
        |  SELECT p.term, p.exact_count, MIN(c.cell) AS est_count
        |  FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
        |  GROUP BY 1, 2)
        |SELECT term, exact_count, est_count,
        |  est_count - exact_count AS overshoot
        |FROM est WHERE est_count >= exact_count
        |ORDER BY exact_count DESC, term""".stripMargin,

    "q40_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, TRIM(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp_full,
        | md5(substr(norm, 1, 64)) AS fp_prefix,
        | LENGTH(norm) AS norm_len
        |FROM n ORDER BY doc_id""".stripMargin,

    "q65_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks, len(toks) AS n_tok,
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]) AS grams2,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams3,
        |    len(list_filter(range(1, len(toks)), i -> toks[i] = toks[i+1])) AS adj_repeats
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        | ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok, 6) AS distinct_ratio,
        | ROUND(CAST(len(grams2) - len(list_distinct(grams2)) AS DOUBLE) / greatest(len(grams2), 1), 6) AS dup_2gram_ratio,
        | ROUND(CAST(len(grams3) - len(list_distinct(grams3)) AS DOUBLE) / greatest(len(grams3), 1), 6) AS dup_3gram_ratio,
        | CAST(adj_repeats AS BIGINT) AS adj_repeats
        |FROM g ORDER BY doc_id""".stripMargin,

    "q66_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, source,
        |    substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h4,
        |    CASE WHEN lang = 'en' THEN '4000' ELSE '2000' END AS rate_hex
        |  FROM documents)
        |SELECT doc_id, lang, source, h4
        |FROM h WHERE h4 < rate_hex ORDER BY doc_id""".stripMargin,

    "q73_quality_filter" ->
      s"""${qualityFlagsSqlFrom("documents")}
         |ORDER BY doc_id""".stripMargin,

    "q68_pii_scrub" ->
      s"""WITH pii AS ($piiDocsSql),
         |r AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '$emailRe')) AS n_emails,
         |    len(regexp_extract_all(text, '$ipRe')) AS n_ips,
         |    regexp_replace(regexp_replace(text,
         |      '$emailRe', '[EMAIL]', 'g'), '$ipRe', '[IP]', 'g') AS clean0
         |  FROM pii)
         |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
         | CAST(n_ips AS BIGINT) AS n_ips,
         | CAST(len(regexp_extract_all(clean0, '$phoneRe')) AS BIGINT) AS n_phones,
         | CAST(LENGTH(regexp_replace(clean0, '$phoneRe', '[PHONE]', 'g')) AS BIGINT) AS clean_len,
         | md5(regexp_replace(clean0, '$phoneRe', '[PHONE]', 'g')) AS clean_fp
         |FROM r ORDER BY doc_id""".stripMargin,

    "q82_chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    UNNEST(generate_series(0, LEN(toks) - 1, 48)) AS start_tok
        |  FROM t),
        |c AS (
        |  SELECT doc_id, start_tok,
        |    list_slice(toks, start_tok + 1, start_tok + 64) AS chunk
        |  FROM s)
        |SELECT doc_id, start_tok // 48 AS chunk_idx,
        | CAST(start_tok AS BIGINT) AS start_tok,
        | CAST(LEN(chunk) AS BIGINT) AS n_tok,
        | ('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 8))::BIGINT
        |   AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q83_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents),
        |tfc AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term,
        |    ROUND(t.tf * LN(n.n / d.df), 6) AS score
        |  FROM tfc t JOIN dfc d USING (term), n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, score, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q85_reservoir_topk" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    md5('res:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
        |  FROM h)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,

    "q86_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT) AS bucket,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q94_inverted_index" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents)
        |SELECT term, COUNT(*) AS df,
        | ARRAY_TO_STRING((LIST(doc_id ORDER BY doc_id))[1:5], ',')
        |   AS postings_head
        |FROM t GROUP BY term HAVING COUNT(*) >= 3
        |ORDER BY term""".stripMargin,

    // Mirrors tokenEntropy: the Σ c·ln(c) fold is list_reduce over the
    // SAME sorted distinct-token list — a strict left fold like Spark's
    // `aggregate` (DuckDB's first step t1+t2 equals Spark's (0+t1)+t2
    // since 0+x is exact), so the double op sequence matches exactly.
    "q95_token_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, len(toks) AS n_tok,
        |    len(list_distinct(toks)) AS n_distinct,
        |    list_reduce(list_transform(list_transform(
        |        list_sort(list_distinct(toks)),
        |        t -> CAST(len(list_filter(toks, x -> x = t)) AS DOUBLE)),
        |      c -> c * ln(c)),
        |      (acc, t) -> acc + t) AS sum_clnc
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        | CAST(n_distinct AS BIGINT) AS n_distinct,
        | ROUND(LN(CAST(n_tok AS DOUBLE)) - sum_clnc / n_tok, 6) AS entropy,
        | ROUND(CASE WHEN n_distinct > 1
        |   THEN (LN(CAST(n_tok AS DOUBLE)) - sum_clnc / n_tok)
        |     / LN(CAST(n_distinct AS DOUBLE))
        |   ELSE 0.0 END, 6) AS entropy_ratio
        |FROM c ORDER BY doc_id""".stripMargin,

    // Same fixed term order (spark, query, fast), same literal
    // constants (1.2, 2.2, 0.25, 0.75), same op sequence as the Spark
    // side — round(6) before ranking, doc_id tiebreak.
    "q96_bm25" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(lower(text), '\s+') AS toks,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) AS dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, dl,
        |    CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf_spark,
        |    CAST(len(list_filter(toks, x -> x = 'query')) AS DOUBLE) AS tf_query,
        |    CAST(len(list_filter(toks, x -> x = 'fast')) AS DOUBLE) AS tf_fast
        |  FROM d),
        |st AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl,
        |    CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
        |    CAST(SUM(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_query,
        |    CAST(SUM(CASE WHEN tf_fast > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_fast
        |  FROM tf),
        |scored AS (
        |  SELECT doc_id, tf_spark, tf_query, tf_fast,
        |    ROUND(
        |      ((LN(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5))
        |          * (tf_spark * 2.2)
        |          / (tf_spark + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |        + LN(1.0 + (n_docs - df_query + 0.5) / (df_query + 0.5))
        |          * (tf_query * 2.2)
        |          / (tf_query + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        |       + LN(1.0 + (n_docs - df_fast + 0.5) / (df_fast + 0.5))
        |         * (tf_fast * 2.2)
        |         / (tf_fast + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
        |  FROM tf, st)
        |SELECT doc_id, CAST(tf_spark AS BIGINT) AS tf_spark,
        | CAST(tf_query AS BIGINT) AS tf_query,
        | CAST(tf_fast AS BIGINT) AS tf_fast, score
        |FROM scored WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q111_winnowing" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, toks FROM t WHERE len(toks) >= 6),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> ('0x'||substr(md5(array_to_string(toks[i:i+2], ' ')),1,8))::BIGINT)
        |      AS hs
        |  FROM f),
        |w AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(
        |      list_transform(generate_series(1, len(hs) - 3),
        |        j -> list_min(hs[j:j+3])))) AS prints
        |  FROM h)
        |SELECT doc_id, CAST(len(prints) AS BIGINT) AS n_prints,
        | ARRAY_TO_STRING(prints, ',') AS prints
        |FROM w ORDER BY doc_id""".stripMargin,

    "q112_winnow_matches" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 6),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> ('0x'||substr(md5(array_to_string(toks[i:i+2], ' ')),1,8))::BIGINT)
        |      AS hs
        |  FROM f),
        |p AS (
        |  SELECT DISTINCT doc_id, UNNEST(
        |    list_distinct(list_transform(generate_series(1, len(hs) - 3),
        |      j -> list_min(hs[j:j+3])))) AS print
        |  FROM h),
        |rare AS (
        |  SELECT print FROM p GROUP BY print HAVING COUNT(*) <= 20),
        |k AS (SELECT p.doc_id, p.print FROM p JOIN rare USING (print))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        |FROM k a JOIN k b ON a.print = b.print AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q148_bm25_search" ->
      """WITH q AS (
        |  SELECT * FROM (VALUES (1, 'spark join fast'),
        |    (2, 'window agg stream'), (3, 'customer order value'))
        |    AS t(query_id, qtext)),
        |qt AS (
        |  SELECT query_id, UNNEST(regexp_split_to_array(qtext, ' ')) AS term
        |  FROM q),
        |dd AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM dd),
        |post AS (
        |  SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf FROM (
        |    SELECT doc_id, dl, UNNEST(toks) AS term FROM dl)
        |  GROUP BY 1, 2, 3),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl
        |  FROM dl),
        |terms AS (SELECT DISTINCT term FROM qt),
        |mp AS (SELECT p.* FROM post p JOIN terms USING (term)),
        |dft AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM mp GROUP BY 1),
        |st AS (
        |  SELECT qt.query_id, mp.doc_id,
        |    CAST(ROUND((LN(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        |      * (mp.tf * 2.2)
        |      / (mp.tf + 1.2 * (0.25 + 0.75 * mp.dl / s.avgdl)))
        |      * 1000000.0) AS BIGINT) AS sfp
        |  FROM mp JOIN qt USING (term) JOIN dft USING (term)
        |  CROSS JOIN stats s),
        |pd AS (
        |  SELECT query_id, doc_id, SUM(sfp) AS score_fp,
        |    COUNT(*) AS n_terms_hit
        |  FROM st GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score_fp, n_terms_hit,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_fp DESC, doc_id) AS rk
        |  FROM pd)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rk AS BIGINT) AS rk,
        |  doc_id, CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
        |  ROUND(CAST(score_fp AS DOUBLE) / 1000000.0, 6) AS score
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q145_gopher_rules" ->
      ("WITH " + gopherCtes + "\n" +
       """SELECT doc_id, n_words, ROUND(mwl, 6) AS mean_word_len,
         |  ROUND(dupf, 6) AS dup_frac, stop_hits,
         |  CAST(fail_mask AS BIGINT) AS fail_mask,
         |  CAST(fail_mask = 0 AS INTEGER) AS keep
         |FROM m ORDER BY doc_id""".stripMargin),

    // the fold's addition order differs from AVG's; round(6) absorbs it
    "q109_char_lm_score" ->
      ("WITH " + charLmScoreCtes + "\n" +
        "SELECT doc_id, n_bigrams, avg_logp FROM scored ORDER BY doc_id"),

    "q183_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] AS tok FROM (
        |    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |    FROM documents), UNNEST(generate_series(1, len(t))) AS u(i)),
        |n AS (SELECT COUNT(*) AS n_total FROM toks),
        |tc AS (SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY tok),
        |pairs AS (
        |  SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS n_pair
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id
        |    AND b.pos > a.pos AND b.pos <= a.pos + 4
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 20)
        |SELECT p.w1, p.w2, p.n_pair,
        |  ROUND(LN((CAST(p.n_pair AS DOUBLE) * n.n_total)
        |    / (CAST(t1.n_tok AS DOUBLE) * t2.n_tok)), 6) AS pmi
        |FROM pairs p
        |JOIN tc t1 ON t1.tok = p.w1
        |JOIN tc t2 ON t2.tok = p.w2
        |CROSS JOIN n
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    "q184_next_word_suggest" ->
      """WITH toks AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] AS tok FROM (
        |    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |    FROM documents), UNNEST(generate_series(1, len(t))) AS u(i)),
        |heads AS (
        |  SELECT tok AS w1 FROM (
        |    SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY tok
        |    ORDER BY n_tok DESC, tok LIMIT 20)),
        |bg AS (
        |  SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS n
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id
        |    AND b.pos = a.pos + 1
        |  GROUP BY 1, 2),
        |hb AS (SELECT bg.* FROM bg JOIN heads USING (w1)),
        |ranked AS (
        |  SELECT w1, w2, n, ROW_NUMBER() OVER (PARTITION BY w1
        |    ORDER BY n DESC, w2) AS rn
        |  FROM hb)
        |SELECT w1, w2, n FROM ranked WHERE rn <= 3
        |ORDER BY w1, n DESC, w2""".stripMargin,

    // string-shares the q145 rule CTEs: the matrix provably reports
    // the gated rules' own firings
    "q182_rule_firing_matrix" ->
      ("WITH " + gopherCtes + """,
        |j AS (
        |  SELECT d2.source, m.fail_mask FROM m
        |  JOIN documents d2 ON d2.doc_id = m.doc_id)
        |SELECT source, COUNT(*) AS n_docs,
        |  ROUND(CAST(SUM(fail_mask & 1) AS DOUBLE) / COUNT(*), 6)
        |    AS r_wordcount,
        |  ROUND(CAST(SUM((fail_mask >> 1) & 1) AS DOUBLE) / COUNT(*), 6)
        |    AS r_wordlen,
        |  ROUND(CAST(SUM((fail_mask >> 2) & 1) AS DOUBLE) / COUNT(*), 6)
        |    AS r_dupwords,
        |  ROUND(CAST(SUM((fail_mask >> 3) & 1) AS DOUBLE) / COUNT(*), 6)
        |    AS r_stopwords,
        |  ROUND(CAST(SUM(CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS keep_rate
        |FROM j GROUP BY source ORDER BY source""".stripMargin),

    "q180_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, ch, COUNT(*) AS c FROM (
        |    SELECT doc_id, UNNEST(regexp_split_to_array(text, '')) AS ch
        |    FROM documents)
        |  GROUP BY 1, 2),
        |n AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |    COUNT(*) AS n_distinct
        |  FROM chars GROUP BY 1),
        |terms AS (
        |  SELECT c.doc_id, n.n, n.n_distinct,
        |    CAST(ROUND((CAST(c.c AS DOUBLE) / n.n)
        |      * LN(CAST(n.n AS DOUBLE) / c.c) * 1000000000.0) AS BIGINT)
        |      AS t
        |  FROM chars c JOIN n USING (doc_id)),
        |h AS (
        |  SELECT doc_id, n AS n_chars, n_distinct,
        |    ROUND(CAST(SUM(t) AS BIGINT) / 1000000000.0, 6)
        |      AS entropy_nats
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT doc_id, n_chars, n_distinct, entropy_nats,
        |  entropy_nats < 2.0 OR entropy_nats > 4.2 AS suspicious
        |FROM h ORDER BY doc_id""".stripMargin,

    // string-shares BOTH gated CTE sets (q109 scoring + q145 rules):
    // the calibration provably relates the two gated signals
    "q177_quality_calibration" ->
      ("WITH " + charLmScoreCtes + ",\n" + gopherCtes + ",\n" +
       """j AS (
         |  SELECT s.doc_id, s.avg_logp,
         |    CASE WHEN m.fail_mask = 0 THEN 1 ELSE 0 END AS keep
         |  FROM scored s JOIN m ON m.doc_id = s.doc_id),
         |qn AS (
         |  SELECT *, CAST(NTILE(5) OVER (ORDER BY avg_logp DESC, doc_id)
         |    AS INTEGER) AS quintile
         |  FROM j)
         |SELECT quintile, COUNT(*) AS n_docs,
         |  ROUND(CAST(SUM(CAST(avg_logp AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*), 6) AS mean_logp,
         |  ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_rate
         |FROM qn GROUP BY 1 ORDER BY quintile""".stripMargin),

    // string-shares q109's scoring CTEs: the bucketed scores are
    // provably the gated scorer's own numbers
    "q144_ccnet_buckets" ->
      ("WITH " + charLmScoreCtes + ",\n" +
        """lb AS (
          |  SELECT d.lang, s.doc_id, s.avg_logp,
          |    NTILE(3) OVER (PARTITION BY d.lang
          |      ORDER BY s.avg_logp DESC, s.doc_id) AS bucket
          |  FROM scored s JOIN documents d USING (doc_id))
          |SELECT lang, CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n_docs,
          |  ROUND(AVG(avg_logp), 6) AS mean_logp,
          |  MAX(avg_logp) AS best_logp, MIN(avg_logp) AS worst_logp
          |FROM lb GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin),

    "q100_domain_cap" ->
      """SELECT source, doc_id, n_chars, rk FROM (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 30 ORDER BY source, rk""".stripMargin,

    "q71_domain_mix" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
        |r AS (
        |  SELECT source, n_src,
        |    LEAST(1.0, (SELECT SUM(n_src) FROM c)
        |      / (SELECT CAST(COUNT(*) AS DOUBLE) FROM c) / n_src) AS keep_rate
        |  FROM c),
        |k AS (
        |  SELECT d.source, r.keep_rate
        |  FROM documents d JOIN r ON d.source = r.source
        |  WHERE CAST(('0x'||substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT AS DOUBLE)
        |    < r.keep_rate * 4294967296.0)
        |SELECT source, COUNT(*) AS n_kept,
        | ROUND(MAX(keep_rate), 6) AS keep_rate
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q67_sequence_pack" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id % 8 AS shard,
        |    len(regexp_split_to_array(text, '\s+')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, shard, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM d)
        |SELECT lang, CAST(shard AS BIGINT) AS shard,
        | CAST(cum_before // 2048 AS BIGINT) AS pack_id,
        | COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY lang, shard, pack_id
        |ORDER BY lang, shard, pack_id""".stripMargin
  )
}
