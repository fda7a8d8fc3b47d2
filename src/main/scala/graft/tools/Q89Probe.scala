package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q89_pagerank (round 12, guide §1): times the
  * edge-list build (orders⋈lineitem → concat → sym/distinct → deg →
  * checkpoint), each incremental iteration count, and the declared
  * query, warm, noop-materialized — to find where the 4s goes before
  * touching the operator.
  */
object Q89Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag ${times.min}%.3f s (3 reps: " +
        times.map(t => f"$t%.2f").mkString(" ") + ")")
    }
    import graft.testqueries.Tables
    def edges = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    time("edges_raw") { noop(edges) }
    time("sym_distinct") {
      val e = edges
      noop(e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    }
    time("ewithdeg_build") {
      val e = edges
      val sym = e.select(col("src").cast("string").as("src"),
          col("dst").cast("string").as("dst"))
        .union(e.select(col("dst").cast("string").as("src"),
          col("src").cast("string").as("dst")))
        .distinct()
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      noop(sym.join(deg.withColumnRenamed("node", "src"), "src"))
    }
    for (iters <- Seq(1, 2, 3)) {
      time(s"pagerank_iters$iters") {
        noop(graft.ops.Graphs.pageRankUndirected(edges, "src", "dst",
          iters, 85L, 100L))
      }
    }
    time("q89_declared") {
      noop(graft.testqueries.Registry.all
        .find(_.name == "q89_pagerank").get.run(spark, d))
    }
    spark.stop()
  }
}
