package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway scratchpad for engine-parity probes (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Unicode canonicalText parity probe: print codepoints so a
    // DuckDB-side diff is byte-exact, not terminal-rendering-exact.
    val df = spark.read.parquet("/tmp/unitest/t.parquet")
      .select(col("id"),
        trim(regexp_replace(
          regexp_replace(lower(col("t")), "[^\\p{L}\\p{N}\\s]", ""),
          "\\s+", " ")).as("c"))
      .orderBy("id")
    df.collect().foreach { r =>
      val cps = r.getString(1).codePoints().toArray.toSeq
        .map(c => f"U+$c%04X").mkString(" ")
      println(s"PROBE ${r.getLong(0)} [${r.getString(1)}] $cps")
    }
    spark.stop()
  }
}
