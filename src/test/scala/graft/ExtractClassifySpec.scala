package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classify, Extract}

/** HTML boilerplate extraction (q155), count-min sketch (q156), and
  * the trained NB language identifier (q157).
  */
class ExtractClassifySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- q155 extraction ----------------------------------------------

  private def extract(html: String): String = {
    Seq(Tuple1(html)).toDF("html")
      .select(Extract.extractText(col("html")).as("t"))
      .collect()(0).getString(0)
  }

  test("extract: scripts/styles dropped whole, tags stripped, ws collapsed") {
    val got = extract(
      "<html><head><script>if (1 < 2) { x(); }</script>" +
        "<style>p > span {display:none}</style></head>" +
        "<body>  <p>Hello   <b>world</b></p> </body></html>")
    assert(got == "Hello world", s"got: '$got'")
  }

  test("extract: truncated record with unclosed <script>/<style> leaks no payload") {
    // r9 advisor fix: a crawl record cut mid-block used to strip only
    // the opening tag and leak the whole JS payload into the text.
    assert(extract("<p>keep this</p><script>var secret = trackUser();")
      == "keep this")
    assert(extract("<p>body text</p><style>.x{color:red") == "body text")
    // and the closed-block path is unaffected
    assert(extract("<script>a()</script><p>ok</p><script>drop to end")
      == "ok")
    // case-variant closers must match the CLOSED-pair rule — a
    // case-sensitive miss would hand the tail to the unclosed-block
    // fallback and wipe the article after the script (r9 review fix)
    assert(extract("<p>intro</p><script>x()</SCRIPT><p>article body</p>")
      == "intro article body")
    assert(extract("<p>a</p><STYLE>.x{}</Style><p>b</p>") == "a b")
    // whitespace-bearing closers ('</script >', real-generator output)
    // must ALSO match the closed-pair rule — before the r9 review fix
    // they fell through to the fallback and destroyed the whole tail
    assert(extract("<p>pre</p><script>x()</script ><p>article body</p>")
      == "pre article body")
    assert(extract("<p>a</p><style>.x{}</style\n><p>b</p>") == "a b")
  }

  test("extract: entities decode, &amp; LAST (no double decode)") {
    // &amp;lt; is the literal text "&lt;" — decoding &amp; first
    // would turn it into a real < (the classic double-decode bug)
    assert(extract("<p>a &amp; b</p>") == "a & b")
    assert(extract("<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;")
    assert(extract("<p>&lt;em&gt; &quot;q&quot; &#39;s&#39;</p>")
      == "<em> \"q\" 's'")
  }

  test("gated q155: extraction recovers the original text body") {
    // the wrapper injects known chrome; the recovered text must
    // contain the original doc text (whitespace-collapsed)
    val rows = SparkEntry.queries("q155_html_extract")(spark, sf).limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("raw_len") > r.getAs[Int]("extracted_len"))
      assert(r.getAs[Long]("n_tags") >= 10L)
      assert(r.getAs[String]("head40").startsWith("doc Home & About"))
    }
  }

  // ---- q156 CMS ------------------------------------------------------

  test("gated q156: CMS point estimates dominate exact counts (one-sided)") {
    val rows = SparkEntry.queries("q156_cms_heavy")(spark, sf).collect()
    assert(rows.length == 20, s"rows: ${rows.length}")
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_count")
      val est = r.getAs[Long]("est_count")
      assert(est >= exact, s"${r.getAs[String]("term")}: est $est < exact $exact")
      assert(r.getAs[Long]("overshoot") == est - exact)
    }
  }

  // ---- q157 NB lang-id ----------------------------------------------

  test("nb lang-id: separable alphabets classify perfectly") {
    val docs = ((0 until 20).map(i =>
        (i.toLong, "alpha beta gamma alpha beta", "aa")) ++
      (0 until 20).map(i =>
        (100L + i, "zulu yankee xray zulu yankee", "zz")))
      .toDF("doc_id", "text", "lang")
    val got = Classify.nbLangIdConfusion(docs)
      .orderBy(col("lang_true"), col("lang_pred")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    assert(got.toSeq == Seq(("aa", "aa", 10L), ("zz", "zz", 10L)),
      got.mkString(", "))
  }

  test("nb lang-id: prior dominates for (nearly) out-of-vocab text") {
    // train: 3 docs of lang "big", 1 of lang "sml" (same text, so
    // per-bigram stats differ only via corpus size); the test doc has
    // ONE oov bigram, so the smoothing penalty (ln(1/(t_l+V)), worse
    // for the bigger corpus: -3.37 vs -2.56) is outweighed by the
    // prior gap (ln 3/4 vs ln 1/4) -> predicted "big"
    val docs = Seq(
      (0L, "same same", "big"), (2L, "same same", "big"),
      (4L, "same same", "big"), (6L, "same same", "sml"),
      (1L, "qq", "big")
    ).toDF("doc_id", "text", "lang")
    val got = Classify.nbLangIdConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    assert(got.toSeq == Seq(("big", "big", 1L)), got.mkString(", "))
  }
}
