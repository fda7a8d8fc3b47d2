package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage latency decomposition of the q53 curation pipeline
  * (scan → qualityScore → +languageId → +dedup → declared query incl.
  * sort), warm, noop-materialized — the profile that drove the round-4
  * optimizations: shared split + per-word case folding (languageId),
  * rlike existence for CJK, regexp_count over extract_all, single-pass
  * window dedup, materialize-before-range-sort (sortedPMat). */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.testqueries.Tables.documents(spark, d)
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      System.gc()
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    time("scan_only") { noop(docs.select("doc_id")) }
    time("scan_text") { noop(docs.select("text")) }
    time("quality") { noop(graft.ops.TextAnalysis.qualityScore(docs, "text")) }
    time("quality_langid") { noop(graft.ops.TextAnalysis.languageId(
      graft.ops.TextAnalysis.qualityScore(docs, "text"), "text")) }
    time("curate_full") { noop(graft.ops.TextAnalysis.curate(
      docs, "doc_id", "text", 10, 0.3)) }
    time("q53_declared") { noop(graft.testqueries.Registry.all
      .find(_.name == "q53_curation").get.run(spark, d)) }
    spark.stop()
  }
}
