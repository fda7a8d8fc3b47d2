package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic behind the q88 sf10 find: which tail RDDs carry
  * preferred locations under the SCHEDULER's walk (the lookup
  * DefaultPartitionCoalescer uses when a downstream coalesce(1) groups
  * partitions)? Measured here: shuffle-exchange outputs report one
  * uniform host-level location (map-output reduce locality) for every
  * partition, and the coalescer's seed-then-append grouping preserves
  * index order when the location set is uniform; narrow chains over
  * localCheckpoint report executor-cache BLOCK locations, and
  * checkpoint blocks can be evicted under pressure — a PARTIAL
  * location set moves the coalescer's seed off partition 0 and the
  * concatenation comes out rotated (exactly the q88 sf10 symptom: a
  * clean whole-partition rotation). Durable rule: a partition-order-
  * dependent sink must sit directly above an exchange, never narrow
  * above cached/checkpointed partitions. SCALE.md "sf10
  * executed-correctness gate" records the post-mortem. */
object LocProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def prefs(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val rdd = df.queryExecution.toRdd
      rdd.count() // materialize parents (checkpoint blocks, map outputs)
      val ps = rdd.partitions.take(4).map(p =>
        org.apache.spark.GraftSchedulerView.preferredLocs(
          spark.sparkContext, rdd, p.index).mkString(","))
      println(s"PROBE $label: [${ps.mkString(" | ")}]")
    }
    val base = spark.range(100000).withColumn("k", col("id") % 97)
    prefs(base.repartitionByRange(col("id")), "shuffle(rangeExchange)")
    prefs(base.groupBy("k").count(), "shuffle(aggExchange)")
    prefs(base.localCheckpoint(true).filter(col("id") > 5),
      "narrow-over-localCheckpoint")
    spark.stop()
  }
}
