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
        (col("l_us") / windowUs).cast("long"),
        (col("l_us") / windowUs).cast("long") + 1)))
    val rb = right.select(col(rId).as("r_id"),
        expr(s"unix_micros(cast($tsCol as timestamp))").as("r_us"))
      .withColumn("bucket", (col("r_us") / windowUs).cast("long"))
    lb.join(rb, "bucket")
      .filter(col("r_us") >= col("l_us") &&
        col("r_us") - col("l_us") < windowUs)
      .select("l_id", "r_id", "l_us", "r_us")
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
