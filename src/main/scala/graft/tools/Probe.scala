package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway scratchpad for engine-parity probes (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/repo/data/sf3")
    val df = graft.ops.TextAnalysis.unigramLmScore(
      spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"Q84PROBE $d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
