package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (e.g. a handful of problems holding most observations at 100 TB).
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * explicit salting is for when one side is small enough to replicate but
  * too big to broadcast, or when AQE's thresholds don't trigger.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `keys`, salted `saltFactor` ways:
    * the large side gets a deterministic per-row salt (hash of all
    * columns — spreads a hot key over saltFactor reducers), the small
    * side is replicated saltFactor times. Result equals the unsalted
    * inner join (property-tested).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val saltL = pmod(
      xxhash64(large.columns.toIndexedSeq.map(large(_)): _*),
      lit(saltFactor))
    val l = large.withColumn("__salt", saltL)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Top-k heavy keys of a frame — the observability half of skew
    * handling: measure before salting. */
  def keyHistogram(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col(keys.head))
      .limit(k)
}
