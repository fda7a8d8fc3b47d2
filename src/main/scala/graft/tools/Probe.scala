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
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") === 0)
    val n = Fns.normalizeSource(col("text"))
    d.select(
      substring(concat(lit("blob "), octet_length(n).cast("string"),
        lit(" "), n), 1, 20).as("prefix"),
      sha2(concat(lit("blob "), octet_length(n).cast("string"),
        lit(" "), n), 256).as("h2"))
      .show(false)
    spark.stop()
  }
}
