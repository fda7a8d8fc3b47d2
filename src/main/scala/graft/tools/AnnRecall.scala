package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Recall evaluation for the approximate similarity paths: recall@k of
  * LSH (sign-random-projection) and IVF against the exact brute-force
  * top-k on the testdata embeddings — the accuracy half of the
  * speed/accuracy trade every ANN index makes.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 50)
    val k = 5

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(Similarity.bruteForceTopK(e, queries, "vec_id",
      "embedding", k))
    def recall(approx: Set[(Long, Long)]) =
      approx.intersect(exact).size.toDouble / exact.size
    println(s"ANN_RECALL exact_pairs=${exact.size} (k=$k)")
    Seq(2, 3, 4).foreach { p =>
      val r = recall(pairs(Similarity.lshTopK(e, queries, "vec_id",
        "embedding", k, planes = p)))
      println(f"ANN_RECALL lsh planes=$p recall=$r%.3f " +
        f"(scans ~1/${1 << p} of corpus)")
    }
    Seq(1, 2, 4, 8).foreach { np =>
      val r = recall(pairs(Similarity.ivfTopK(e, queries, "vec_id",
        "embedding", k, nCells = 8, nProbe = np)))
      println(f"ANN_RECALL ivf cells=8 probe=$np recall=$r%.3f " +
        f"(scans ~$np/8 of corpus)")
    }
    // int8 quantization: full scan, 1/4 the bytes — recall loss is
    // rounding-only (per-vector scales cancel in the cosine)
    val rq = recall(pairs(Similarity.bruteForceTopKQuantized(e, queries,
      "vec_id", "embedding", k)))
    println(f"ANN_RECALL int8 full-scan recall=$rq%.3f (1 byte/dim)")
    spark.stop()
  }
}
