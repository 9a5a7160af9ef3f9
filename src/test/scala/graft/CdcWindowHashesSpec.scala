package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rolling CDC window hash: rolled values must equal the naive
  * per-window polynomial fold (the DuckDB mirror's arithmetic), and
  * the anchor set must be content-defined (alignment-shift robust).
  */
class CdcWindowHashesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = 2147483647L

  /** Naive reference: fold every window independently — byte-for-byte
    * the oracle's list_reduce arithmetic. */
  private def naive(text: String, win: Int): Seq[Long] = {
    val cp = text.codePoints().toArray
    (0 to cp.length - win).flatMap { i =>
      var h1 = 0L; var h2 = 0L
      (i until i + win).foreach { j =>
        h1 = (h1 * 257 + cp(j)) % P
        h2 = (h2 * 263 + cp(j)) % P
      }
      if (h1 % 16 == 0) Some((h1 << 31) | h2) else None
    }
  }

  private def rolled(text: String, win: Int): Seq[Long] =
    Seq(text).toDF("text")
      .select(call_function("cdc_window_hashes", col("text"), lit(win)).as("hs"))
      .collect().head.getSeq[Long](0)

  test("rolled hashes equal the naive per-window fold (incl. multibyte)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog while seventeen green " +
        "turtles carry mysterious packages across the wide frozen river",
      "совершенно другой текст с кириллицей и ascii mixed content here " +
        "plus some 数字 and punctuation!!! to push the codepoint range wide",
      "a" * 120, // degenerate: all windows identical
      "short")   // below the window: no rows
    texts.foreach { t =>
      assert(rolled(t, 50) == naive(t, 50), s"mismatch on: ${t.take(40)}")
    }
  }

  test("anchors are content-defined: a shifted copy shares interior windows") {
    val body = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles carry mysterious packages across the wide frozen river"
    val shifted = "UNALIGNED-PREFIX-OF-ODD-LENGTH@@@ " + body + " AND A TRAILER"
    val a = naive(body, 50).toSet
    val b = naive(shifted, 50).toSet
    assert((a intersect b).nonEmpty,
      "interior anchored windows must survive an alignment shift")
  }

  test("GraftFunctions facade wrappers resolve and agree with call_function") {
    import graft.functions.GraftFunctions
    val t = "the quick brown fox jumps over the lazy dog near the wide river bank"
    val viaFacade = Seq(t).toDF("text")
      .select(GraftFunctions.cdc_window_hashes(col("text")).as("hs"),
        size(GraftFunctions.cdc_window_hits(col("text"))).as("nh"))
      .collect().head
    assert(viaFacade.getSeq[Long](0) == rolled(t, 50))
    assert(viaFacade.getInt(1) == rolled(t, 50).size)
  }

  test("anchor density is ~1/16 on real corpus text") {
    val docs = GraftSession.table(spark, sf, "documents")
      .filter(length(col("text")) >= 50)
    val r = docs.select(
        size(call_function("cdc_window_hashes", col("text"), lit(50))).as("na"),
        (length(col("text")) - 49).as("np"))
      .agg(sum(col("na")).as("anchors"), sum(col("np")).as("positions"))
      .collect().head
    val density = r.getLong(0).toDouble / r.getLong(1)
    assert(density > 1.0 / 24 && density < 1.0 / 11,
      s"anchor density far from 1/16: $density")
  }
}
