package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.{portableHash, table}

/** Web-extraction rung (SURVEY.md §2.C91) — the HTML→text boilerplate
  * strip that sits in front of every crawl-derived corpus (the WET
  * step of a Common-Crawl-style pipeline): drop script/style blocks
  * whole, strip tags, decode entities, collapse whitespace.
  *
  * The documents table is already plain text, so the gated query
  * first WRAPS each doc in a deterministic HTML page (nav chrome,
  * script/style payloads, entity-encoded footer — the q127
  * fan-out pattern: synthesize the mess, then prove the cleanup), and
  * extraction must recover text whose only deltas are the injected
  * chrome. Everything is scan-side codegen'd string work — no UDF, no
  * join, no shuffle before the output projection; at 100 TB this runs
  * at scan speed per partition.
  *
  * Determinism: regexp_replace semantics agree between Spark (Java
  * regex) and DuckDB (RE2) on this pattern subset — non-greedy
  * dot-all block matches, `<[^>]+>` tags, `\s+` collapse; entity
  * decode is plain replace chains with &amp; decoded LAST (decoding
  * it first would re-interpret "&amp;lt;" as a tag opener — the
  * classic double-decode bug, pinned by spec).
  */
object Extract {

  /** Strip `html` to text: script/style blocks → ' ', tags → ' ',
    * entities decoded, whitespace collapsed, trimmed. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    // All four patterns are case-insensitive ((?i)), and the close tags
    // tolerate trailing whitespace ('</script >' is emitted by real
    // generators): any closed-pair miss — case or spacing — would hand
    // the whole tail to the unclosed-block fallback below and destroy
    // valid content, so the pair patterns must match every variant a
    // parser would close on.
    // Truncated-record fallback (advisor, r9): a crawl record cut
    // mid-block leaves an UNTERMINATED <script>/<style>; the closed-
    // pair patterns above then strip only the opening tag and the
    // whole JS/CSS payload leaks into the text. Drop any unclosed
    // block to end-of-record — exactly the q166 truncation shape.
    val noOpenScript = regexp_replace(noStyle, "(?is)<script[^>]*>.*$", " ")
    val noOpenStyle = regexp_replace(noOpenScript, "(?is)<style[^>]*>.*$", " ")
    val noTags = regexp_replace(noOpenStyle, "<[^>]+>", " ")
    // entities: specific codes first, ampersand LAST
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The deterministic HTML wrapper for the gated query: chrome +
    * script/style payloads + an entity-encoded footer around `text`. */
  private[operators] def wrapHtml(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><title>doc</title><script type=\"text/javascript\">" +
        "var tracker = "), docId,
      lit("; if (1 < 2) { track(); }</script><style>.nav{color:red} " +
        "p > span{display:none}</style></head><body>" +
        "<div class=\"nav\">Home &amp; About</div><p>"), text,
      lit("</p><footer>&copy; 2024 Example &lt;corp&gt; &#39;legal&#39;" +
        "</footer></body></html>"))

  /** Crawl-stitch detection: find (A, B) pairs where A's 40-char
    * SUFFIX equals B's 40-char PREFIX — the signature of one source
    * page split across two crawl records with an overlapped window
    * (truncation + re-fetch, paginated extraction). One uniform join
    * on a 32-bit hash of the boundary window, verified on the exact
    * strings so a hash collision can't fabricate a stitch; docs
    * shorter than 2×40 chars are excluded (their halves can't carry a
    * meaningful boundary). Scale: two scan-side projections of 40
    * chars/doc and one hash-keyed join whose buckets are "docs
    * sharing a boundary window" — df-bounded the same way the
    * shingle blocking is. */
  def stitchCandidates(docs: DataFrame, w: Int = 40): DataFrame = {
    val eligible = docs.filter(length(col("text")) >= 2 * w)
    val sfx = eligible.select(col("doc_id").as("doc_a"),
      expr(s"substring(text, length(text) - ${w - 1}, $w)").as("boundary"))
    val pfx = eligible.select(col("doc_id").as("doc_b"),
      substring(col("text"), 1, w).as("boundary"))
    sfx.withColumn("h", portableHash(col("boundary")))
      .join(pfx.withColumn("h", portableHash(col("boundary"))),
        Seq("h", "boundary"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("boundary"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q166_split_docs" -> ((s, dir) => {
      // The q155 synthesize-the-mess pattern: split every doc into an
      // overlapped (front, back) record pair — front carries the
      // boundary window twice over the midpoint, back starts with it —
      // then prove stitch detection recovers exactly the (2id, 2id+1)
      // pairs. Docs under 160 chars are left whole (and must NOT
      // produce pairs).
      val docs = table(s, dir, "documents")
      val split = docs.filter(length(col("text")) >= 160)
        .select(col("doc_id"), col("text"),
          expr("cast(length(text) div 2 as int)").as("m"))
      val halves = split.select(col("doc_id"), posexplode(array(
          expr("substring(text, 1, m + 39)"),
          expr("substring(text, m, length(text) - m + 1)")))
          .as(Seq("half", "text")))
        .select((col("doc_id") * 2 + col("half")).as("doc_id"), col("text"))
      stitchCandidates(halves)
        .select(col("doc_a"), col("doc_b"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q155_html_extract" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      docs
        .withColumn("html", wrapHtml(col("doc_id"), col("text")))
        .withColumn("extracted", extractText(col("html")))
        .select(col("doc_id"),
          length(col("html")).as("raw_len"),
          length(col("extracted")).as("extracted_len"),
          size(regexp_extract_all(col("html"), lit("<[^>]+>"), lit(0)))
            .cast("long").as("n_tags"),
          portableHash(col("extracted")).as("extract_hash"),
          substring(col("extracted"), 1, 40).as("head40"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // The split fan-out and boundary join mirrored verbatim (the
    // oracle joins on the exact boundary strings; the Spark side's
    // 32-bit hash key is an optimization the exact-string equality
    // already subsumes).
    "q166_split_docs" ->
      """WITH split AS (
        |  SELECT doc_id, text, CAST(length(text) // 2 AS INTEGER) AS m
        |  FROM documents WHERE length(text) >= 160),
        |halves AS (
        |  SELECT doc_id * 2 AS doc_id, substr(text, 1, m + 39) AS text
        |  FROM split
        |  UNION ALL
        |  SELECT doc_id * 2 + 1, substr(text, m, length(text) - m + 1)
        |  FROM split),
        |eligible AS (SELECT * FROM halves WHERE length(text) >= 80),
        |sfx AS (
        |  SELECT doc_id AS doc_a,
        |    substr(text, length(text) - 39, 40) AS boundary
        |  FROM eligible),
        |pfx AS (
        |  SELECT doc_id AS doc_b, substr(text, 1, 40) AS boundary
        |  FROM eligible)
        |SELECT s.doc_a, p.doc_b
        |FROM sfx s JOIN pfx p
        |  ON s.boundary = p.boundary AND s.doc_a <> p.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,

    // The same wrap + strip chain in DuckDB's regexp dialect ('g' =
    // replace-all, matching Spark's default).
    "q155_html_extract" ->
      """WITH wrapped AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc</title>' ||
        |    '<script type="text/javascript">var tracker = ' || doc_id ||
        |    '; if (1 < 2) { track(); }</script>' ||
        |    '<style>.nav{color:red} p > span{display:none}</style>' ||
        |    '</head><body><div class="nav">Home &amp; About</div><p>' ||
        |    text ||
        |    '</p><footer>&copy; 2024 Example &lt;corp&gt; &#39;legal&#39;' ||
        |    '</footer></body></html>' AS html
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(
        |                  regexp_replace(
        |                    regexp_replace(
        |                      regexp_replace(
        |                        regexp_replace(
        |                          regexp_replace(html,
        |                            '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
        |                          '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
        |                        '(?is)<script[^>]*>.*$', ' ', 'g'),
        |                      '(?is)<style[^>]*>.*$', ' ', 'g'),
        |                    '<[^>]+>', ' ', 'g'),
        |                  '&lt;', '<', 'g'),
        |                '&gt;', '>', 'g'),
        |              '&quot;', '"', 'g'),
        |            '&#39;', CHR(39), 'g'),
        |          '&nbsp;', ' ', 'g'),
        |        '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS extracted
        |  FROM wrapped)
        |SELECT doc_id, length(html) AS raw_len,
        |  length(extracted) AS extracted_len,
        |  CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags,
        |  ('0x' || substr(md5(extracted), 1, 8))::BIGINT AS extract_hash,
        |  substr(extracted, 1, 40) AS head40
        |FROM stripped ORDER BY doc_id""".stripMargin
  )
}
