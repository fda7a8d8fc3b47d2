package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Mergeable frequency sketches — the Count-Min sketch (Cormode &
  * Muthukrishnan 2005) over the portable universal-hash family
  * ([[Fns.hashMember]]): every counter is a deterministic integer, so
  * an external engine replays the sketch bit-for-bit — unlike
  * library sketch implementations whose hash choices are opaque.
  * Complements the HLL distinct-count state in
  * [[IncrementalAgg.statsOfWithDistinct]]: HLL answers "how many
  * distinct", Count-Min answers "how often does key k occur" in
  * depth×width integers regardless of key cardinality.
  *
  * Scale shape: the build is one `groupBy(j, bucket)` — map-side
  * partial aggregation collapses every task's contribution to at most
  * depth×width rows before the exchange, so the shuffle is sketch-
  * sized, not data-sized, exactly the property that makes the sketch
  * the right tool for heavy-hitter estimation over 100 TB of events.
  * Sketches from disjoint corpora merge by bucket-wise addition
  * (the groupBy of a union — associative counters).
  */
object Sketches {

  private def bucketCol(h: Column, j: Int, width: Int): Column =
    Fns.hashMember(h, j) % width

  /** Build a depth×width Count-Min sketch of `key`'s frequency
    * distribution: rows (j, bucket, cnt) — at most depth×width of
    * them, missing (j, bucket) combinations are zero. */
  def countMin(df: DataFrame, key: Column, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "countMin needs depth,width >= 1")
    df.select(Fns.hashBase(key.cast("string")).as("__h"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"),
          bucketCol(col("__h"), j, width).as("bucket"))): _*)).as("s"))
      .groupBy(col("s.j").as("j"), col("s.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each `keys` row from a sketch:
    * `est = min_j cnt[j][h_j(k)]` (absent buckets count 0). The
    * classic guarantee holds by construction: est >= true count, with
    * overestimation only when ALL depth buckets collide. */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "cmEstimate needs depth,width >= 1")
    keys
      .select(key.as("key"), Fns.hashBase(key.cast("string")).as("__h"))
      .select(col("key"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"),
          bucketCol(col("__h"), j, width).as("bucket"))): _*)).as("s"))
      .select(col("key"), col("s.j").as("j"), col("s.bucket").as("bucket"))
      // the sketch side is depth×width rows — always broadcastable
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** EXACT heavy hitters with a Count-Min pruning pass — the
    * sketch-to-candidates-to-exact pattern (the frequency twin of
    * [[BloomJoin.bloomSemiJoin]]'s membership version): the sketch
    * never underestimates, so `est >= threshold` yields a candidate
    * superset of the true heavy hitters; the exact counting pass then
    * runs ONLY over rows whose key is a candidate (broadcast semi-join
    * — candidates are at most the hot tail, sketch-bounded) and its
    * final `>= threshold` filter removes the collision-inflated false
    * candidates. Output = exactly `GROUP BY key HAVING count >= t`,
    * with the full-cardinality exact aggregation replaced by one
    * sketch-sized shuffle + one candidate-sized one.
    */
  def cmHeavyHitters(df: DataFrame, key: Column, depth: Int,
      width: Int, threshold: Long): DataFrame = {
    val keyed = df.select(key.as("key"),
      Fns.hashBase(key.cast("string")).as("__h"))
    val sketch = countMin(df, key, depth, width).localCheckpoint(true)
    // Per-row probe: depth broadcast joins against the (≤ depth×width
    // row) sketch — rows whose estimate can't reach the threshold die
    // BEFORE any key shuffle. No distinct-key pass anywhere: a
    // distinct() candidate enumeration would itself be the
    // full-cardinality shuffle the sketch exists to avoid.
    val probed = (0 until depth).foldLeft(keyed) { (acc, j) =>
      val side = broadcast(sketch.filter(col("j") === j)
        .select(col("bucket").as(s"__b$j"), col("cnt").as(s"__c$j")))
      acc.join(side, bucketCol(col("__h"), j, width) === col(s"__b$j"),
          "left")
        .drop(s"__b$j")
    }
    val est = least((0 until depth)
      .map(j => coalesce(col(s"__c$j"), lit(0L))): _*)
    probed.filter(est >= threshold)
      .groupBy("key")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
