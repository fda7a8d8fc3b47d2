package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the IVF ANN chain (q116/q119/q120, round 12,
  * guide §1): seed selection, each Lloyd round, assignment, masses, and
  * the declared queries — warm, noop-materialized.
  */
object IvfProbe {
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
    val e = graft.testqueries.Tables.embeddings(spark, d)
    import graft.ops.Similarity
    time("emb_scan") { noop(e) }
    time("centroids_lloyd0") {
      noop(Similarity.ivfCentroids(e, "vec_id", "embedding", 8, 0)) }
    time("centroids_lloyd1") {
      noop(Similarity.ivfCentroids(e, "vec_id", "embedding", 8, 1)) }
    time("centroids_lloyd2") {
      noop(Similarity.ivfCentroids(e, "vec_id", "embedding", 8, 2)) }
    time("assign_full") {
      val c = Similarity.ivfCentroids(e, "vec_id", "embedding", 8, 2)
        .localCheckpoint(true)
      noop(Similarity.assignCells(e, c, "vec_id", "embedding"))
    }
    for (q <- Seq("q116_ivf_topk", "q119_ann_selector",
        "q120_ivf_topk_quantized", "q74_semantic_dedup")) {
      val qd = graft.testqueries.Registry.all.find(_.name == q).get
      time(q) { noop(qd.run(spark, d)) }
    }
    spark.stop()
  }
}
