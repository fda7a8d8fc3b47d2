package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

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
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(df: => DataFrame): Unit = (1 to 3).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      noop(df)
      println(f"AB $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_returnflag")

    def sigFused = li.repartition(col("l_orderkey"))
      .groupBy("l_suppkey", "l_orderkey")
      .agg(graft.plans.OrderedSigAgg.sig(col("l_linenumber"),
        col("l_returnflag")).as("sig"))
    def sigComposed = li.repartition(col("l_orderkey"))
      .groupBy("l_suppkey", "l_orderkey")
      .agg(md5(to_json(Fns.orderedCollect(col("l_linenumber"),
        col("l_returnflag")))).as("sig"))

    def votes(s1: DataFrame) = s1
      .groupBy("l_orderkey", "sig")
      .agg(collect_set(col("l_suppkey")).as("supps"))
      .withColumn("votes", size(col("supps")))

    def full(s1: DataFrame) = {
      val withConsensus = votes(s1)
        .withColumn("consensus_sig", first(col("sig")).over(
          Window.partitionBy("l_orderkey")
            .orderBy(desc("votes"), col("sig"))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
      withConsensus
        .select(col("l_orderkey"),
          (col("sig") === col("consensus_sig")).cast("int").as("agree"),
          explode(col("supps")).as("implementation"))
        .groupBy("implementation")
        .agg(count(lit(1)).as("n_tests"),
          sum(col("agree")).as("n_agree"),
          (sum(col("agree")).cast("double") /
            count(lit(1))).as("agreement_ratio"))
        .repartition(1)
        .sortWithinPartitions(desc("agreement_ratio"),
          col("implementation"))
    }

    // windowed shape: no collect_set, no explode — votes and consensus
    // as two window passes over the order-partitioned sig rows (both
    // window specs are satisfied by hashpartitioning(l_orderkey): no
    // further exchange), then the tiny per-supplier rollup
    def fullWindowed(s1: DataFrame) = s1
      .withColumn("votes", count(lit(1)).over(
        Window.partitionBy("l_orderkey", "sig")))
      .withColumn("consensus_sig", first(col("sig")).over(
        Window.partitionBy("l_orderkey")
          .orderBy(desc("votes"), col("sig"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select(col("l_suppkey").as("implementation"),
        (col("sig") === col("consensus_sig")).cast("int").as("agree"))
      .groupBy("implementation")
      .agg(count(lit(1)).as("n_tests"),
        sum(col("agree")).as("n_agree"),
        (sum(col("agree")).cast("double") /
          count(lit(1))).as("agreement_ratio"))
      .repartition(1)
      .sortWithinPartitions(desc("agreement_ratio"),
        col("implementation"))

    def sigComposedBin = li.repartition(col("l_orderkey"))
      .groupBy("l_suppkey", "l_orderkey")
      .agg(unhex(md5(to_json(Fns.orderedCollect(col("l_linenumber"),
        col("l_returnflag"))))).as("sig"))

    t("scan+repart")(li.repartition(col("l_orderkey")))
    t("full composed (r03)")(full(sigComposed))
    t("full windowed")(fullWindowed(sigComposed))
    t("full windowed binsig")(fullWindowed(sigComposedBin))
    t("full windowed fused")(fullWindowed(sigFused))
    spark.stop()
  }
}
