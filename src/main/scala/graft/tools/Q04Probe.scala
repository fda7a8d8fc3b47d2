package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directed A/B for q04's exact-aggregation cost: same-JVM interleaved
  * timing of (a) the shipped DECIMAL(28,2)-buffer form, (b) the
  * micro-unit LONG-cents form (exact while the group sum fits 2^63 —
  * see Q04 notes in SCALE.md), (c) the non-exact double form as the
  * floor. Usage: Q04Probe <sfDir> [reps]
  */
object Q04Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def decForm: DataFrame = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(28,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(28,2)")).cast("double")
          .as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(8,2)") -
            col("l_discount").cast("decimal(8,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

    def centsForm: DataFrame = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0)
          .as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("sum_base_price"),
        (sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

    def dblForm: DataFrame = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))

    def run(df: DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all three
    Seq(decForm, centsForm, dblForm).foreach(run)
    val t = collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      t("dec") = run(decForm) :: t.getOrElse("dec", Nil)
      t("cents") = run(centsForm) :: t.getOrElse("cents", Nil)
      t("dbl") = run(dblForm) :: t.getOrElse("dbl", Nil)
    }
    t.toSeq.sortBy(_._1).foreach { case (k, xs) =>
      val s = xs.sorted
      // true median for even rep counts (upper-element alone biases up)
      val med = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"Q04_PROBE $k%-6s min=${xs.min}%.3f med=$med%.3f")
    }
    // value parity: cents vs decimal must agree exactly after the
    // terminal double conversion (2dp inputs => both are exact sums)
    val a = decForm.orderBy("l_returnflag", "l_linestatus").collect()
    val b = centsForm.orderBy("l_returnflag", "l_linestatus").collect()
    val same = a.zip(b).forall { case (x, y) =>
      (2 to 4).forall(i => x.getDouble(i) == y.getDouble(i)) }
    println(s"Q04_PROBE parity=${if (same) "EXACT" else "DIFFERS"}")
    spark.stop()
  }
}
