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
    // saltFactor=0 would not fail: pmod(x, 0) is null and
    // sequence(0, -1) is [0, -1], so the join silently returns 0 rows.
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    // withColumn REPLACES by name — a pre-existing __salt column on
    // either input would silently join on the wrong thing.
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    val saltL = pmod(
      xxhash64(large.columns.toIndexedSeq.map(large(_)): _*),
      lit(saltFactor))
    val l = large.withColumn("__salt", saltL)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Salted two-phase AGGREGATION — the groupBy counterpart of
    * [[saltedJoin]]. Hash aggregation's map-side combine usually
    * absorbs key skew (the exchange carries one partial row per
    * (mapper, key)), but it degrades exactly when it matters: many
    * cold keys alongside the hot ones blow the in-memory hash map and
    * Spark falls back to sort-based aggregation, spilling the hot
    * key's raw rows into the exchange after all. Phase 1 groups by
    * `(k, hash(saltSrc) % salts)` — the hot key fans out over `salts`
    * reducers — phase 2 re-aggregates the ≤ salts partial rows per
    * key.
    *
    * Exposed for COUNT + exact DECIMAL SUM only: partials stay DECIMAL
    * through both phases (an FP sum would become order-dependent under
    * re-association — the reason [[graft.functions.Fns.sumDec]]
    * exists); the one double cast happens after the final exact sum,
    * so the result is bit-identical to the unsalted aggregate.
    */
  def saltedCountSum(df: DataFrame, key: Column, saltSrc: Column,
      valueCol: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val partial = df
      .groupBy(key.as("k"), pmod(hash(saltSrc), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(valueCol.cast("decimal(28,2)")).as("__s"))
    partial.groupBy(col("k"))
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("s"))
  }

  /** Top-k heavy keys of a frame — the observability half of skew
    * handling: measure before salting. */
  def keyHistogram(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col(keys.head))
      .limit(k)
}
