package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of the q74 semanticDedup chain (round 12):
  * centroid build, assignment (broadcast×nCells + min_by today),
  * intra-cell pair enumeration, connected components, final window —
  * noop-materialized, warm, min-of-2. Drives the assignment-as-
  * projection decision the IVF chain already took.
  */
object Q74Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE74 $tag ${ts.min}%.3f s")
    }
    val vecs = graft.testqueries.Tables.embeddings(spark, sf)
    val (idc, vc) = ("vec_id", "embedding")
    val nCells = 8
    val threshold = 0.3

    val dd = (c: org.apache.spark.sql.Column) =>
      transform(c, _.cast("double"))
    time("centroids") {
      noop(graft.ops.Similarity.ivfCentroids(vecs, idc, vc, nCells, 0))
    }
    val centroids = graft.ops.Similarity
      .ivfCentroids(vecs, idc, vc, nCells, 0)
      .select(col("cent_id"), col("cv"),
        sqrt(graft.functions.Fns.dotProduct(col("cv"), col("cv")))
          .as("__cnorm"))
    val scored = vecs
      .select(col(idc), dd(col(vc)).as("__ed"),
        sqrt(graft.functions.Fns.dotProduct(dd(col(vc)), dd(col(vc))))
          .as("__norm"))
      .join(broadcast(centroids))
      .select(col(idc), col("__ed"), col("cent_id"),
        round(graft.functions.Fns.dotProduct(col("__ed"), col("cv"))
          / (col("__norm") * col("__cnorm")), 6).as("__csim"))
    val cells = scored.groupBy(idc)
      .agg(min_by(struct(col("cent_id"), col("__csim")),
          struct(negate(col("__csim")), col("cent_id"))).as("__best"),
        first(col("__ed")).as("__ed"))
      .select(col(idc), col("__best.cent_id").as("cell"),
        col("__best.__csim").as("cent_sim"), col("__ed"))
    time("assign_minby") { noop(cells) }
    val pairs = graft.ops.Dedup.embeddingNearDup(
      cells.select(col(idc), col("cell"), col("__ed").as(vc)),
      idc, vc, "cell", threshold)
    time("assign_plus_pairs") { noop(pairs) }
    time("semdedup_full") {
      noop(graft.ops.Dedup.semanticDedup(vecs, idc, vc, nCells,
        threshold, 0))
    }
    spark.stop()
  }
}
