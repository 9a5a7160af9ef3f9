package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** SURVEY.md §2.D: sources/sinks round-trips and the functions facade. */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("csv round-trip preserves rows and schema-on-read works") {
    val out = Files.createTempDirectory("csv").toString + "/nation"
    val nation = GraftSession.table(spark, sf, "nation")
    nation.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == nation.count())
    assert(back.columns.sameElements(nation.columns))
    val sums = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum("n_nationkey")).collect().head.getLong(0)
    assert(sums(back) == sums(nation))
  }

  test("json round-trip preserves values") {
    val out = Files.createTempDirectory("json").toString + "/region"
    val region = GraftSession.table(spark, sf, "region")
    region.write.json(out)
    val back = spark.read.json(out)
    assert(back.count() == region.count())
    assert(back.select("r_name").collect().map(_.getString(0)).sorted
      .sameElements(region.select("r_name").collect().map(_.getString(0)).sorted))
  }

  test("orc round-trip preserves rows, schema, and values") {
    val out = Files.createTempDirectory("orc").toString + "/customer"
    val customer = GraftSession.table(spark, sf, "customer")
    customer.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == customer.count())
    assert(back.columns.sameElements(customer.columns))
    // typed columns survive (ORC keeps the schema, unlike csv inference)
    assert(back.schema == customer.schema)
    val sums = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum("c_custkey")).collect().head.getLong(0)
    assert(sums(back) == sums(customer))
  }

  test("freq_topk_agg facade returns the MG summary as typed rows") {
    import spark.implicits._
    val df = (Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq("c", "d")).toDF("w")
    val rows = df.agg(GraftFunctions.freq_topk_agg(col("w"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.take(2).toSeq === Seq("a" -> 100L, "b" -> 60L))
  }

  test("cosine_sim facade: native and builtin fallback agree") {
    val emb = GraftSession.table(spark, sf, "embeddings").limit(50)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        GraftFunctions.cosine_sim(col("embedding"), col("qv")).as("native"),
        GraftFunctions.cosine_sim_builtin(col("embedding"), col("qv")).as("builtin"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("cosineTopK df-level API returns the same heads as q35") {
    val emb = GraftSession.table(spark, sf, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val api = graft.operators.Similarity.cosineTopK(
      emb.filter(col("vec_id") =!= 0), qv, 10)
      .collect().map(_.getAs[Long]("vec_id"))
    val q35 = SparkEntry.queries("q35_cosine_topk")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(api.sameElements(q35))
  }

  test("query plans: replay pushes the offset predicate into the scan") {
    val plan = SparkEntry.queries("q20_replay_from_offset")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(event_id,500"), plan)
  }

  test("query plans: multi-join broadcasts every dim (single fact shuffle)") {
    val plan = SparkEntry.queries("q06_multi_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length >= 5,
      s"expected >=4 broadcast joins:\n$plan")
  }

  test("query plans: cosine topk is broadcast + TakeOrdered, no sort shuffle") {
    val plan = SparkEntry.queries("q35_cosine_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
