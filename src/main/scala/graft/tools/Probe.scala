package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Throwaway scratchpad for engine-parity probes (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val s1 = li.filter(col("l_suppkey") === 63)
      .groupBy("l_suppkey", "l_orderkey")
      .agg(to_json(Fns.orderedCollect(col("l_linenumber"),
        col("l_returnflag"))).as("sig"))
    val s2 = s1.groupBy("l_suppkey")
      .agg(to_json(Fns.orderedCollect(col("l_orderkey"),
        col("sig"))).as("fp"))
    s2.coalesce(1).write.mode("overwrite").parquet("/tmp/probe_s2")
    spark.stop()
  }
}
