package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.functions.Fns

/** Evidence probe for the round-12 ANN selector: prints the candidate
  * decision statistics (cell-mass concentration; mean assigned-centroid
  * cosine "coherence") on the corpora whose recall boundary
  * `ann_recall_r11.txt` documents, so the selector's statistic and
  * threshold are MEASURED, not guessed. */
object AnnSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def stats(name: String, corpus: DataFrame, nCells: Int): Unit = {
      val sel = Similarity.annSelect(corpus, "vec_id", "embedding",
        nCells = nCells)
      // coherence: mean 6-dp cosine of each vector to its assigned
      // centroid (micro-unit exact)
      val coh = sel.cells
        .join(broadcast(sel.centroids),
          col("cell") === col("cent_id"))
        .agg(sum(round(round(Fns.cosine(col("embedding"), col("cv")), 6)
          * 1e6).cast("long")).as("s"), count(lit(1)).as("n"))
        .head()
      val cohMean = coh.getLong(0).toDouble / coh.getLong(1) / 1e6
      val masses = sel.masses.orderBy(desc("__mass"))
        .collect().map(_.getLong(1))
      println(f"ANN_SKEW $name nCells=$nCells skew=${sel.skew}%.3f " +
        f"useIvf=${sel.useIvf} coherence=$cohMean%.4f " +
        s"masses=${masses.mkString(",")}")
    }

    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    stats("testdata-embeddings", e, 16)
    stats("testdata-embeddings", e, 8)

    // AnnRecall's clustered mixture corpus (verbatim construction)
    val dims = 64
    val nClusters = 16
    val clustered = spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), dd =>
        (sin((col("id") % nClusters) * 37 + dd * 13) +
          (pmod(xxhash64(col("id"), dd), lit(1000)).cast("double")
            / 1000.0 - 0.5) * 0.2).cast("float")).as("embedding"))
      .localCheckpoint(true)
    stats("annrecall-clustered", clustered, 16)

    // spec fixture: 4 equal tight clusters
    val rnd = new scala.util.Random(19)
    val centers = Seq(Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
    val spec4 = (0L until 120L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    stats("spec-4clusters", spec4, 16)

    val uniform = (0L until 400L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    stats("spec-uniform8d", uniform, 16)

    val uniform64 = (0L until 2000L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    stats("spec-uniform64d", uniform64, 16)

    spark.stop()
  }
}
