package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns
object C70 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.testqueries.Tables.documents(spark, d)
    def time(tag: String)(f: => Unit): Unit = {
      f; System.gc(); val t0 = System.nanoTime(); f
      println(f"C70 $tag ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    time("words") { noop(corpus.select(col("doc_id"), Fns.words(col("text")).as("w"))) }
    time("shingle_explode") { noop(corpus.select(col("doc_id"), explode(Fns.shingles(Fns.words(col("text")), 4)).as("s"))) }
    time("bench_shingles_distinct") { noop(bench.select(explode(Fns.shingles(Fns.words(col("text")), 4)).as("s")).distinct()) }
    time("full") { noop(graft.ops.TextAnalysis.contamination(corpus, bench, "doc_id", "text", 4)) }
    spark.stop()
  }
}
