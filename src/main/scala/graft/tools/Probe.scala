package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway scratchpad for engine-parity probes (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(df: => DataFrame): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      noop(df)
      println(f"AB $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def joined = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val o = spark.read.parquet(s"$d/orders.parquet")
      val c = spark.read.parquet(s"$d/customer.parquet")
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderstatus") =!= "X" && col("c_acctbal") > 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("o_orderpriority"), col("c_name"), col("c_mktsegment"),
          col("l_extendedprice"))
    }
    t("q03 range orderBy")(joined.orderBy("l_orderkey", "l_linenumber"))
    t("q03 repartition(1)+sort")(joined.repartition(1)
      .sortWithinPartitions("l_orderkey", "l_linenumber"))
    spark.stop()
  }
}
