package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for q55_grouping_sets (flagged as a possible
  * sf0.1 regression in round 5): scan → agg-no-sort → full declared
  * query, plus the same aggregation via rollup for comparison. */
object Q55Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val li = graft.testqueries.Tables.lineitem(spark, d)
    li.createOrReplaceTempView("v_li")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      (0 until 3).foreach { _ =>
        System.gc()
        val t0 = System.nanoTime(); f
        println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    time("scan_cols") { noop(li.select("l_returnflag", "l_linestatus",
      "l_quantity")) }
    time("plain_agg") { noop(spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*),
           SUM(CAST(l_quantity AS DECIMAL(28,2)))
         FROM v_li GROUP BY 1, 2""")) }
    time("gsets_nosort") { noop(spark.sql(
      """SELECT CAST(grouping(l_returnflag) AS INT),
           CAST(grouping(l_linestatus) AS INT),
           COALESCE(l_returnflag, '<all>'), COALESCE(l_linestatus, '<all>'),
           COUNT(*), CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
         FROM v_li GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_linestatus), ())""")) }
    time("q55_declared") { noop(graft.testqueries.Registry.all
      .find(_.name == "q55_grouping_sets").get.run(spark, d)) }
    spark.stop()
  }
}
