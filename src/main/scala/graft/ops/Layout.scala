package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.ZOrderExpr

/** Multi-dimensional data layout for file-level skipping at scale.
  *
  * A 100 TB table is pruned by file/row-group min-max statistics, and
  * those statistics are only selective if the WRITE ORDER makes every
  * file's bounding box compact. Linear sort gives that on the leading
  * column only; Z-ordering (Morton interleave, [[ZOrderExpr]]) gives a
  * compact box in every interleaved dimension at once — the
  * `OPTIMIZE ZORDER BY` idea expressed with plain Spark primitives:
  * `repartitionByRange(zorder(dims))` + `sortWithinPartitions`, so
  * Catalyst plans ONE range exchange and the parquet writer sees rows
  * in curve order. [[partitionBounds]] + [[prunablePartitions]]
  * quantify the effect (LayoutSpec asserts Z beats linear on
  * non-leading-dimension predicates).
  */
object Layout {

  /** Rewrite `df` into Z-order curve layout over `dims` (int/long
    * columns, already bounded to ≤32 bits for 2 dims — use
    * `pmod`/bucketing upstream for wider domains). `partitions` sizes
    * the range exchange (one output file per partition under a direct
    * `write`). The curve key is dropped from the result — it exists to
    * order the write, not to be stored. */
  def zorderBy(df: DataFrame, dims: Seq[Column],
      partitions: Int): DataFrame =
    df.withColumn("__zorder", ZOrderExpr.zorder(dims: _*))
      .repartitionByRange(partitions, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")

  /** Per-partition min/max of each named column — the file-level
    * statistics a parquet writer would emit for this layout, computed
    * without writing. One row per partition: (partition, c_min, c_max
    * per column). */
  def partitionBounds(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid").as("partition"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))): _*)

  /** How many partitions a box predicate `lo(c) <= c <= hi(c)` must
    * read under the layout captured by [[partitionBounds]] — a
    * partition survives pruning iff its bounding box intersects the
    * query box on EVERY constrained column. The driver-side count is
    * over the (small, bounded) per-partition stats frame, exactly like
    * a query planner consulting the file index. */
  def prunablePartitions(bounds: DataFrame,
      box: Map[String, (Long, Long)]): Long = {
    val intersects = box.map { case (c, (lo, hi)) =>
      col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
    }.reduce(_ && _)
    bounds.filter(intersects).count()
  }
}
