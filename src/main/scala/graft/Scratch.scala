package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val p = docs.select(col("doc_id"), substring(col("text"),1,8).as("blk"), substring(col("text"),1,60).as("pfx"))
    val ok = p.groupBy(col("blk")).agg(count(lit(1)).as("bs")).filter(col("bs") <= 1000).select(col("blk"))
    val pc = p.join(ok, Seq("blk"), "left_semi").repartition(32, col("blk"))
    val joined = pc.as("a").join(pc.as("b"), col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
    joined.select(count(lit(1))).collect()
    def time[A](tag: String)(f: => A): Unit = { val t0=System.nanoTime(); f; println(f"[scratch] $tag: ${(System.nanoTime()-t0)/1e6}%.0f ms") }
    time("pairs count 1")(joined.select(count(lit(1))).collect())
    time("pairs count 2")(joined.select(count(lit(1))).collect())
    val withLev = joined.select(levenshtein(col("a.pfx"), col("b.pfx"), 15).as("lev"))
    time("lev thresh 1")(withLev.agg(sum(col("lev"))).collect())
    time("lev thresh 2")(withLev.agg(sum(col("lev"))).collect())
    val withLevF = joined.select(levenshtein(col("a.pfx"), col("b.pfx")).as("lev"))
    time("lev full 1")(withLevF.agg(sum(col("lev"))).collect())
    time("lev full 2")(withLevF.agg(sum(col("lev"))).collect())
    val q = SparkEntry.queries("q119_edit_distance_pairs")(spark, "/root/testdata/sf0.1")
    time("q119 full 1")(q.write.format("noop").mode("overwrite").save())
    time("q119 full 2")(SparkEntry.queries("q119_edit_distance_pairs")(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save())
    val noSort = joined.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), levenshtein(col("a.pfx"), col("b.pfx"), 15).as("lev")).filter(col("lev") =!= -1)
    time("q119 no-sort")(noSort.write.format("noop").mode("overwrite").save())
    time("q119 no-sort 2")(noSort.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
