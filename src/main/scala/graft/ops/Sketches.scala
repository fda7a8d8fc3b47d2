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

  /** KMV distinct-count estimate per group ([[graft.plans.KmvAgg]]):
    * `(groupCols*, est_n)`. Exact (the min-set IS the distinct set)
    * below k distinct values; above, the k-th minimum's position in
    * the hash space gives `est = (k-1) * |H| div h_k` — integer floor
    * division over the portable hash, so the estimate replays
    * bit-for-bit in an external engine (DISTINCT + ORDER BY + LIMIT k
    * + the same division). The hash is the FULL 60-bit
    * [[Fns.portableHash60]] (|H| = 2^60), not the mod-P family: a
    * rank statistic only needs comparability, and the ~2^30 mod-P
    * space hits hash birthday collisions from ~1e7-1e8 distinct keys,
    * biasing the estimate low and capping it at ~(k-1)·|H|/h_k
    * regardless of the true cardinality. At |H| = 2^60 the
    * 1/sqrt(k-2) standard error holds through ~1e9 distinct keys per
    * group. The shuffle carries at most k longs per (mapper, group);
    * COUNT(DISTINCT) carries every distinct value. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int): DataFrame = {
    import graft.plans.KmvAgg
    df.groupBy(groupCols.map(col): _*)
      .agg(KmvAgg.kmv(Fns.portableHash60(key.cast("string")), k)
        .as("__mins"))
      .select(groupCols.map(col) :+
        kmvEstimate(col("__mins"), k).as("est_n"): _*)
  }

  /** Distinct-count estimate from a KMV min-set column over the
    * 60-bit hash: exact set size below k, `(k-1) * 2^60 div h_k` once
    * the set is full. The numerator exceeds a long for k > 8, so it
    * is exact decimal(38,0) arithmetic into an integral division —
    * still no FP anywhere (DuckDB mirror: HUGEINT `//`). */
  def kmvEstimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(call_function("div",
        lit(k - 1).cast("decimal(38,0)") * lit(Fns.Hash60Space),
        element_at(mins, k)))

  /** Sub-bucket count per power-of-two major range of the log
    * histogram: 16 geometric minors bound the relative quantile error
    * at 1/16 with <= 32 + 16*59 buckets for any non-negative long. */
  val HistMinors = 16L

  /** HdrHistogram-style bucket index (Tene's high-dynamic-range
    * histogram scheme) for a non-negative integer column: values
    * below 32 map to themselves (exact), larger values split each
    * [2^(m-1), 2^m) major range (m = binary digit count) into
    * [[HistMinors]] geometric minors. Everything is integer
    * arithmetic — floor(log2 v) comes from the length of the binary
    * digit string (`bin`, present in both Spark and DuckDB), the
    * minor from a right shift — so an external engine replays every
    * bucket id bit-for-bit; no FP log anywhere.
    */
  def logBucket(v: Column): Column = {
    val m = length(bin(v)) // = floor(log2 v) + 1 for v >= 1
    // minor index: the top 5 bits of v, i.e. v >> (m - 5), in [16, 32)
    val minor = call_function("shiftright", v, (m - 5))
    when(v < 32, v.cast("long")).otherwise(
      lit(32L) + ((m - 6).cast("long") * HistMinors) + minor - 16L)
  }

  /** Inverse of [[logBucket]]: the smallest value mapping to bucket
    * `b` — the quantile ESTIMATE read off the histogram (a guaranteed
    * lower bound of the true quantile, within relative factor
    * 1 + 1/16). */
  def bucketFloor(b: Column): Column = {
    // (b-32) div 16 via a right shift — Column./ is DOUBLE division
    val major = call_function("shiftright", (b - 32L).cast("long"),
      lit(4)).cast("int")
    val minor = lit(16L) + ((b - 32L) % HistMinors)
    when(b < 32, b.cast("long"))
      .otherwise(call_function("shiftleft", minor, major + 1))
  }

  /** Build a mergeable log-histogram of `value` per group: rows
    * `(groupCols*, bucket, cnt)`. The shuffle is histogram-sized, not
    * data-sized (map-side partial aggregation collapses each task to
    * at most ~1000 buckets per group) — the property that makes this
    * the 100 TB quantile path where exact `percentile` must shuffle
    * and buffer every raw value per group. Histograms of disjoint
    * corpora merge by bucket-wise addition (associative counters),
    * so incremental maintenance is the same `groupBy` over a union.
    */
  def logHistogram(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    df.groupBy((groupCols.map(col) :+ logBucket(value).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Read approximate quantiles off a [[logHistogram]]: for each
    * group and each requested quantile `num/den`, the [[bucketFloor]]
    * of the first bucket whose cumulative count reaches
    * ceil(total * num / den). The rank comparison is exact integer
    * cross-multiplication (`cum * den >= total * num` — an integer
    * cum reaches ceil(x) iff it reaches x), so no division or FP
    * rounding exists anywhere in the read path and the estimate is
    * deterministic at every scale. One window sort over the (tiny)
    * histogram + one final aggregate. */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = byGroup.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("__cum", sum("cnt").over(cum))
      .withColumn("__total", sum("cnt").over(byGroup))
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__total")).as("n"),
        quantiles.map { case (name, num, den) =>
          min(when(col("__cum") * den >= col("__total") * num,
            bucketFloor(col("bucket")))).as(name)
        }: _*)
  }
}
