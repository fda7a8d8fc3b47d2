package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Evidence probe for `lshTopK(saltBuckets)` (round 12 — VERDICT r11
  * #5): on a near-dup-heavy corpus the sign-random-projection buckets
  * concentrate, and the shard-scale shuffle join keyed on `bucket`
  * alone bottlenecks on the reducer that owns the hot bucket. The probe
  * builds such a corpus (30% of vectors are one duplicated point, the
  * rest isotropic noise), then reports
  *   (a) the ANALYTIC reducer exposure: the largest single join key's
  *       share of total in-bucket pair work, unsalted (key = bucket)
  *       vs salted (key = (bucket, salt)) — the quantity a hash
  *       shuffle cannot split below one task, and
  *   (b) wall clock of the full shard-scale top-k, unsalted vs salted
  *       (min of 2 after warm-up),
  * plus a row-count parity check (results are spec-pinned
  * bit-identical; the count here guards the probe itself). */
object LshSaltProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_SALT_N", "20000").toInt
    val salt = sys.env.getOrElse("SPARK_GRAFT_SALT", "8").toInt
    val dims = 64
    // 30% duplicates of one hot vector (hash-derived), 70% isotropic
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), d =>
        when(pmod(col("id"), lit(10)) < 3,
          sin(d * 13 + 1).cast("float"))
          .otherwise((pmod(xxhash64(col("id"), d), lit(1000))
            .cast("double") / 500.0 - 1.0).cast("float")))
        .as("embedding"))
      .localCheckpoint(true)

    // analytic exposure from the bucket histogram (planes=8, dims=64)
    val hist = corpus
      .select(Similarity.lshBucket(col("embedding"), 8, dims)
        .as("bucket"))
      .groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val work = hist.map { case (_, m) => m * m }.sum.toDouble
    val maxShare = hist.map { case (_, m) => m * m }.max / work
    // salted: the corpus side of the hot key splits `salt` ways; the
    // query side is replicated, so per-key work is (m/salt)*m
    val saltedShare = hist.map { case (_, m) =>
      (m.toDouble / salt) * m }.max / work
    println(f"LSH_SALT n=$n planes=8 buckets=${hist.length} " +
      f"max_key_share_unsalted=$maxShare%.3f " +
      f"max_key_share_salted(salt=$salt)=$saltedShare%.3f")

    def timed(mk: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      def once(): (Long, Double) = {
        System.gc()
        val t0 = System.nanoTime()
        val c = mk.count()
        (c, (System.nanoTime() - t0) / 1e9)
      }
      once()
      val (c1, t1) = once(); val (_, t2) = once()
      (c1, math.min(t1, t2))
    }
    val (c0, t0) = timed(Similarity.lshTopK(corpus, corpus, "vec_id",
      "embedding", k = 3, planes = 8, dims = dims,
      queryBroadcast = Some(false)))
    val (c1, t1) = timed(Similarity.lshTopK(corpus, corpus, "vec_id",
      "embedding", k = 3, planes = 8, dims = dims,
      queryBroadcast = Some(false), saltBuckets = salt))
    println(f"LSH_SALT unsalted rows=$c0 wall_s=$t0%.2f | " +
      f"salted(salt=$salt) rows=$c1 wall_s=$t1%.2f | " +
      s"parity=${c0 == c1}")
    spark.stop()
  }
}
