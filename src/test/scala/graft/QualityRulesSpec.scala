package graft

import org.scalatest.funsuite.AnyFunSuite

/** q145 Gopher rules + q144 CCNet buckets — internal-consistency
  * checks the DuckDB hash gate can't express (bit semantics, tercile
  * monotonicity). */
class QualityRulesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gopher rules: mask bits agree with the emitted metrics") {
    val rows = SparkEntry.queries("q145_gopher_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mask = r.getAs[Long]("fail_mask")
      val wc = r.getAs[Long]("n_words")
      val mwl = r.getAs[Double]("mean_word_len")
      val dup = r.getAs[Double]("dup_frac")
      val sh = r.getAs[Long]("stop_hits")
      assert(((mask & 1L) != 0L) == (wc < 40L))
      assert(((mask & 2L) != 0L) == (mwl < 3.8 || mwl > 10.0))
      assert(((mask & 4L) != 0L) == (dup > 0.55))
      assert(((mask & 8L) != 0L) == (sh < 2L))
      assert((r.getAs[Int]("keep") == 1) == (mask == 0L))
    }
    // the rule set discriminates: some docs keep, some fail
    assert(rows.exists(_.getAs[Int]("keep") == 1))
    assert(rows.exists(_.getAs[Int]("keep") == 0))
  }

  test("bm25 search: 5 ranked hits per query, scores monotone, positive") {
    val rows = SparkEntry.queries("q148_bm25_search")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(1L, 2L, 3L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to 5L), s"query $q")
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q not monotone: ${scores.toSeq}")
      assert(scores.forall(_ > 0.0))
      assert(rs.forall(r => r.getAs[Long]("n_terms_hit") >= 1L &&
        r.getAs[Long]("n_terms_hit") <= 3L))
    }
  }

  test("ccnet buckets: 3 terciles per lang, scores monotone head->tail") {
    val rows = SparkEntry.queries("q144_ccnet_buckets")(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("bucket"))
      assert(sorted.map(_.getAs[Int]("bucket")).toSeq == (1 to sorted.length),
        s"$lang buckets not 1..n")
      // ntile ordering: bucket b's worst score >= bucket b+1's best
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("worst_logp") >= lo.getAs[Double]("best_logp"),
            s"$lang tercile order violated")
        case _ =>
      }
      // ntile balance: bucket sizes differ by at most 1
      val sizes = sorted.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1L, s"$lang ntile unbalanced: ${sizes.toSeq}")
    }
  }
}
