package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range and as-of joins — operators Spark lacks natively (SURVEY §2.3
  * notes the reference has neither; both are named extension targets).
  * Composed from equi-join + window primitives so Catalyst plans them as
  * shuffles-by-key instead of the O(n·m) BroadcastNestedLoopJoin a naive
  * non-equi join degenerates into.
  */
object TemporalJoins {

  /** Floor-division bucket: floor(us / w), exact for negative epoch
    * micros. A plain `(us / w).cast("long")` truncates toward zero, so
    * bucket 0 would span (-w, w) and pre-1970 timestamps land in the
    * wrong bucket — harmless under [[rangeJoin]]'s exact post-filter,
    * silently wrong for [[rangeCount]]'s counting arithmetic, which has
    * no post-filter and needs the b/b+1 invariant to hold for all signs.
    * Integer-exact: pmod is non-negative, so (us - pmod) is the largest
    * multiple of w that is <= us.
    */
  private def bucketOf(us: Column, windowUs: Long): Column =
    ((us - pmod(us, lit(windowUs))) / windowUs).cast("long")

  /** Range join: pairs (l, r) with r.ts in [l.ts, l.ts + windowUs).
    * Decomposition: bucket both sides by floor(ts / windowUs); every
    * qualifying pair lands in the left row's bucket b or b+1, so the
    * left side is exploded to {b, b+1} and joined EQUALLY on the bucket,
    * then the exact range predicate filters. Shuffle volume is 2|L|+|R|
    * — no cross product. `lId`/`rId` name passthrough id columns.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, tsCol: String,
      windowUs: Long, lId: String, rId: String): DataFrame = {
    val lb = left.select(col(lId).as("l_id"),
        expr(s"unix_micros(cast($tsCol as timestamp))").as("l_us"))
      .withColumn("bucket", explode(array(
        bucketOf(col("l_us"), windowUs),
        bucketOf(col("l_us"), windowUs) + 1)))
    val rb = right.select(col(rId).as("r_id"),
        expr(s"unix_micros(cast($tsCol as timestamp))").as("r_us"))
      .withColumn("bucket", bucketOf(col("r_us"), windowUs))
    lb.join(rb, "bucket")
      .filter(col("r_us") >= col("l_us") &&
        col("r_us") - col("l_us") < windowUs)
      .select("l_id", "r_id", "l_us", "r_us")
  }

  /** Aggregate range count: for each left row, the NUMBER of right rows
    * with r.ts in [l.ts, l.ts + windowUs) — the aggregate form of
    * [[rangeJoin]] + groupBy/count, without enumerating the pairs.
    *
    * The pair count is quadratic in event density (10x denser events =
    * ~100x pairs; measured on the sf1 gate), so when the caller only
    * needs counts, enumeration is the wrong primitive. Sweep form: every
    * qualifying point for a left row at t in bucket b = floor(t/w) lies
    * in bucket b (at us >= t) or b+1 (at us < t+w). Union right points
    * (weight 1) with two zero-weight probes per left row, rank within
    * each bucket by (us, probe-before-point), and read the two counts
    * off a per-bucket running sum and total:
    * n = (total_b - running(probe@t)) + running(probe@t+w).
    * One hash exchange on the bucket + one window sort + the final
    * per-left-id sum — O((|L|+|R|) log bucket) work regardless of how
    * many pairs the window contains. Per-bucket skew is bounded by
    * event density per window, same as [[rangeJoin]]'s buckets.
    */
  def rangeCount(left: DataFrame, right: DataFrame, tsCol: String,
      windowUs: Long, lId: String): DataFrame = {
    def us(df: DataFrame) =
      expr(s"unix_micros(cast($tsCol as timestamp))")
    // The id column rides along at its NATIVE type (it is only grouped
    // on, never computed with) — a blind cast("long") would turn e.g.
    // string ids into NULL for every row and silently collapse all left
    // rows into one NULL group.
    val idType = left.schema(lId).dataType
    val pts = right.select(us(right).as("us"))
      .select(bucketOf(col("us"), windowUs).as("bucket"),
        col("us"), lit(1).as("is_point"), lit(1L).as("w"),
        lit(null).cast(idType).as("l_id"), lit(0).as("which"))
    val lUs = left.select(col(lId).as("l_id"), us(left).as("us"))
    val lowProbes = lUs.select(
      bucketOf(col("us"), windowUs).as("bucket"), col("us"),
      lit(0).as("is_point"), lit(0L).as("w"), col("l_id"),
      lit(0).as("which"))
    val highProbes = lUs.select(
      (bucketOf(col("us"), windowUs) + 1).as("bucket"),
      (col("us") + windowUs).as("us"),
      lit(0).as("is_point"), lit(0L).as("w"), col("l_id"),
      lit(1).as("which"))
    // probes sort BEFORE points at equal us (is_point 0 < 1), so the
    // running sum at a probe counts points with us strictly below it:
    // inclusive [t, ...) via total-minus-running, exclusive [..., t+w)
    // via running — boundary ties land on the correct side of both.
    val ord = Window.partitionBy("bucket")
      .orderBy(col("us"), col("is_point"), col("l_id"), col("which"))
    val run = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    pts.unionByName(lowProbes).unionByName(highProbes)
      .withColumn("running", sum(col("w")).over(run))
      .withColumn("total",
        sum(col("w")).over(Window.partitionBy("bucket")))
      .filter(col("is_point") === 0)
      .withColumn("contrib",
        when(col("which") === 0, col("total") - col("running"))
          .otherwise(col("running")))
      .groupBy(col("l_id"))
      .agg(sum(col("contrib")).as("n"))
  }

  /** As-of join: for each left row, the single latest right row with
    * right.ts <= left.ts on the same key. Union-window realization: tag
    * and union both sides, sort within key by (ts, side, id), carry the
    * last right id forward with last(ignoreNulls) — one shuffle on the
    * key, no per-row probing. Ties on ts resolve to the largest right
    * id (deterministic).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, lId: String, rId: String): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      lit(1).as("is_left"), lit(null).cast("long").as("r_id"),
      col(lId).cast("long").as("l_id"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("t"),
      lit(0).as("is_left"), col(rId).cast("long").as("r_id"),
      lit(null).cast("long").as("l_id"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("is_left"),
        coalesce(col("r_id"), col("l_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("matched", last(col("r_id"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("l_id"), col("k"), col("t"), col("matched"))
  }
}
