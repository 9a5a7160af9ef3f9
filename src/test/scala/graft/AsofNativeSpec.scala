package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofNative
import graft.plans.{AsofBroadcast, AsofMerge}

/** The whole-operator merge as-of join (AsofJoinPlan/Exec + the
  * AsofNative df API): semantics on a hand-built corpus (latest
  * at-or-before, tiebreaks, left-outer nulls, null keys/times), parity
  * with the composed join+argmax plan of q42 on real data, and the
  * plan-shape claim that motivates it (no aggregate after the join).
  */
class AsofNativeSpec extends AnyFunSuite {
  import SparkTestSession._

  for (hint <- Seq(AsofMerge, AsofBroadcast))
  test(s"latest at-or-before semantics, tiebreaks, left-outer nulls [$hint]") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(5L), "a"),   // ties on right time resolved by seq
      (1L, Option(10L), "b"),  // later event sees the t=9 state
      (2L, Option(7L), "c"),   // exact-time match qualifies (<=)
      (3L, Option(4L), "d"),   // key with no right rows -> nulls
      (2L, None, "e")          // null time never matches -> nulls
    ).toDF("k", "t", "ltag")
    val right = Seq(
      (1L, 5L, 1L, "r1"), (1L, 5L, 2L, "r2"), // same key+time: seq 2 wins
      (1L, 9L, 3L, "r3"),
      (1L, 11L, 4L, "r4"),                    // future row: never visible
      (2L, 7L, 5L, "r5")
    ).toDF("rk", "rt", "seq", "rtag")

    val out = AsofNative.asofJoin(left, right, "k", "rk", "t", "rt",
        Seq("seq"), hint)
      .select(col("ltag"), col("rtag"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap

    assert(out === Map(
      "a" -> Some("r2"), "b" -> Some("r3"), "c" -> Some("r5"),
      "d" -> None, "e" -> None))
  }

  test("merge and broadcast variants both match the composed q42 plan on sf0.001") {
    val q42 = SparkEntry.queries("q42_asof_join")(spark, sf).collect()
    val q79 = SparkEntry.queries("q79_asof_native")(spark, sf).collect()
    val q80 = SparkEntry.queries("q80_asof_broadcast")(spark, sf).collect()
    assert(q79.length === q42.length)
    assert(q79.toSeq === q42.toSeq)
    assert(q80.toSeq === q42.toSeq)
  }

  test("merge plan is a single pass: no aggregate after the join") {
    val df = SparkEntry.queries("q79_asof_native")(spark, sf)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(800))
    assert(!plan.contains("HashAggregate"),
      "the whole point is replacing the post-join argmax aggregation")
  }

  test("randomized differential: both variants match a driver-side oracle") {
    import spark.implicits._
    // heavy key/time collisions, null keys and times, keys that exist
    // on only one side — 6 seeded corpora, both physical variants,
    // ground truth computed independently in plain Scala
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      def mk(n: Int): Seq[(Option[Long], Option[Long], Long)] =
        (0 until n).map { i =>
          val k = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(8).toLong)
          val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(30).toLong)
          (k, t, i.toLong)
        }
      val lRows = mk(150)
      val rRows = mk(150)
      val expected: Map[Long, Option[Long]] = lRows.map { case (lk, lt, id) =>
        id -> (for { k <- lk; t <- lt } yield {
          val cands = rRows.filter(r => r._1.contains(k) && r._2.exists(_ <= t))
          if (cands.isEmpty) None
          else Some(cands.maxBy(c => (c._2.get, c._3))._3)
        }).flatten
      }.toMap
      val left = lRows.toDF("k", "t", "lid")
      val right = rRows.toDF("rk", "rt", "seq")
      for (hint <- Seq(AsofMerge, AsofBroadcast)) {
        val got = AsofNative
          .asofJoin(left, right, "k", "rk", "t", "rt", Seq("seq"), hint)
          .select(col("lid"), col("seq"))
          .collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        assert(got === expected, s"seed=$seed hint=$hint")
      }
    }
  }

  test("randomized differential: composite keys match a driver-side oracle") {
    import spark.implicits._
    // same harness as the single-key differential, but over (k1, k2)
    // pairs with heavy collisions on each component — the lexicographic
    // cursor must only match when BOTH components agree
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      def mk(n: Int): Seq[(Option[Long], Option[Long], Option[Long], Long)] =
        (0 until n).map { i =>
          val k1 = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(4).toLong)
          val k2 = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(4).toLong)
          val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(25).toLong)
          (k1, k2, t, i.toLong)
        }
      val lRows = mk(120)
      val rRows = mk(120)
      val expected: Map[Long, Option[Long]] = lRows.map { case (lk1, lk2, lt, id) =>
        id -> (for { a <- lk1; b <- lk2; t <- lt } yield {
          val cands = rRows.filter(r =>
            r._1.contains(a) && r._2.contains(b) && r._3.exists(_ <= t))
          if (cands.isEmpty) None
          else Some(cands.maxBy(c => (c._3.get, c._4))._4)
        }).flatten
      }.toMap
      val left = lRows.toDF("k1", "k2", "t", "lid")
      val right = rRows.toDF("rk1", "rk2", "rt", "seq")
      for (hint <- Seq(AsofMerge, AsofBroadcast)) {
        val got = AsofNative.asofJoinMulti(left, right,
            Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt", Seq("seq"), hint)
          .select(col("lid"), col("seq"))
          .collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        assert(got === expected, s"seed=$seed hint=$hint")
      }
    }
  }

  test("bucketed fact-fact as-of join plans with ZERO exchanges") {
    // both sides materialized bucketed on the join key: the merge
    // exec's ClusteredDistribution is satisfied straight off the scans
    // (alias-aware through the cast projection) — a 100 TB fact-fact
    // as-of with no shuffle at all, only the per-bucket sorts
    val ev = GraftSession.eventsTable(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
    Seq("ev_bkt", "ord_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      val dir = new java.io.File(wh, t)
      if (dir.exists()) rm(dir)
    }
    graft.operators.Bucketing.materializeBucketed(ev, "ev_bkt", "user_id", buckets = 8)
    graft.operators.Bucketing.materializeBucketed(o, "ord_bkt", "o_custkey", buckets = 8)
    val df = AsofNative.asofJoin(
      spark.table("ev_bkt"), spark.table("ord_bkt"),
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey"), AsofMerge)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
    assert(!plan.contains("Exchange"),
      s"bucketed as-of still shuffles:\n${plan.take(1200)}")
    // and the result matches the unbucketed run
    val expected = AsofNative.asofJoin(ev, o, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey"), AsofMerge)
      .select(col("event_id"), col("o_orderkey")).collect().toSet
    val got = df.select(col("event_id"), col("o_orderkey")).collect().toSet
    assert(got === expected)
  }

  test("composite keys: same user under a different tenant never matches") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 100L, "t10u1"), // tenant 10: has right history
      (20L, 1L, 100L, "t20u1"), // tenant 20, same user id: no history
      (10L, 2L, 100L, "t10u2")  // tenant 10, other user: no history
    ).toDF("tenant", "user", "t", "ltag")
    val right = Seq((10L, 1L, 50L, "state_a"), (10L, 1L, 90L, "state_b"))
      .toDF("rtenant", "ruser", "rt", "rtag")
    for (hint <- Seq(AsofMerge, AsofBroadcast)) {
      val out = AsofNative.asofJoinMulti(left, right,
          Seq("tenant", "user"), Seq("rtenant", "ruser"), "t", "rt", Nil, hint)
        .select(col("ltag"), col("rtag"))
        .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
      assert(out === Map(
        "t10u1" -> Some("state_b"), "t20u1" -> None, "t10u2" -> None),
        s"hint=$hint")
    }
  }

  test("skew-safe salted merge matches unsalted on a 90%-hot-key corpus and spreads the hot key") {
    // one key owns 90% of the fact side — the pathological straggler
    // shape for a key-clustered merge. The salted variant must return
    // byte-identical matches while spreading the hot key over multiple
    // output partitions (the unsalted plan pins it to exactly one).
    val hotKey = (idCol: org.apache.spark.sql.Column) =>
      when(idCol % 10 < 9, lit(1L)).otherwise(pmod(idCol, lit(50)) + 2)
    val left = spark.range(20000).select(
      hotKey(col("id")).as("k"), (col("id") % 1000).as("t"), col("id").as("lid"))
    val right = spark.range(2000).select(
      hotKey(col("id")).as("rk"), ((col("id") * 7) % 1000).as("rt"),
      col("id").as("seq"))
    def matches(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("lid"), col("seq")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    // coalescing off for the spread measurement: this corpus is tiny,
    // so AQE would (symmetrically) merge the 4 partitions into 1 and
    // hide the spread; at real scale partitions exceed the advisory
    // size and keep their salt-spread layout
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val plain = AsofNative.asofJoin(left, right, "k", "rk", "t", "rt",
        Seq("seq"), AsofMerge)
      val salted = AsofNative.asofJoinSkewSafe(left, right, "k", "rk", "t", "rt",
        Seq("seq"), discriminator = "lid", buckets = 16)
      assert(matches(salted) === matches(plain))
      def hotSpread(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.filter(col("k") === 1L).withColumn("pid", spark_partition_id())
          .groupBy("pid").count().collect().map(_.getAs[Long]("count")).toSeq
      val plainSpread = hotSpread(plain)
      assert(plainSpread.size === 1,
        s"unsalted hot key should sit in one task: $plainSpread")
      val saltedSpread = hotSpread(salted)
      assert(saltedSpread.size >= 3,
        s"salted hot key should spread over tasks: $saltedSpread")
      assert(saltedSpread.max.toDouble / saltedSpread.sum < 0.7,
        s"salted hot key still concentrated: $saltedSpread")
    } finally spark.conf.set(coalesceKey, saved)
  }

  test("AQE coalescing is all-or-nothing-symmetric across the merge children") {
    // Spark 4.1's CoalesceShufflePartitions puts BOTH child shuffles of
    // any multi-child node (childrenNeedCompatiblePartitioning — only
    // Union/CartesianProduct/broadcast joins are exempt) into ONE
    // coalesce group with uniform partition specs. So coalescing never
    // needs disabling for the merge as-of: either both sides coalesce
    // identically or neither does. Pin both cases; in each, divergence
    // would fire the exec's invariant require().
    val confs = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.shuffle.partitions" -> "16")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // Case 1: asymmetric sizes — left partitions exceed the advisory
      // size, right alone could coalesce to 1. Independent coalescing
      // would diverge the counts; the group rule coalesces NEITHER.
      val left = spark.range(200000)
        .select((col("id") % 50).as("k"), (col("id") % 1000).as("t"),
          concat(lit("payload_payload_payload_payload_"), col("id")).as("pad"))
      val right = spark.range(500)
        .select((col("id") % 50).as("rk"), (col("id") % 900).as("rt"),
          col("id").as("seq"))
      val df = AsofNative.asofJoin(left, right, "k", "rk", "t", "rt",
        Seq("seq"), AsofMerge)
      assert(df.collect().length === 200000)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"), plan.take(500))
      assert(!plan.contains("AQEShuffleRead"),
        s"one-side coalescing should have been vetoed by the group rule:\n${plan.take(1500)}")
      // Case 2: both sides tiny — both coalesce, with IDENTICAL specs.
      val small = AsofNative.asofJoin(
        spark.range(2000).select((col("id") % 20).as("k"), (col("id") % 100).as("t")),
        spark.range(200).select((col("id") % 20).as("rk"), (col("id") % 90).as("rt"),
          col("id").as("seq")),
        "k", "rk", "t", "rt", Seq("seq"), AsofMerge)
      assert(small.collect().length === 2000)
      val smallPlan = small.queryExecution.executedPlan.toString
      assert(smallPlan.contains("AQEShuffleRead"),
        s"expected symmetric coalescing on tiny sides:\n${smallPlan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("broadcast plan leaves the fact side exchange- and sort-free") {
    val e = GraftSession.eventsTable(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
    // no orderBy here: any exchange/sort in the plan would be the
    // operator's own doing
    val df = AsofNative.asofJoin(e, o, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsofJoin"),
      "small right side must auto-select the broadcast variant: " + plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Sort "),
      "fact side must keep its scan partitioning unsorted: " + plan.take(800))
    // auto-selection flips to merge when broadcasting is disabled
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df2 = AsofNative.asofJoin(e, o, "user_id", "o_custkey",
        "ts", "o_orderdate", Seq("o_orderkey"))
      df2.count()
      val plan2 = df2.queryExecution.executedPlan.toString
      assert(!plan2.contains("BroadcastAsofJoin") && plan2.contains("AsofJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
