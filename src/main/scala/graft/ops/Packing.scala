package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: concatenate the corpus
  * in a deterministic document order and cut it into fixed token-budget
  * bins ("concat-and-cut", the packing used by LLM pretraining loaders).
  * Output per document: its global token offset interval and the bins
  * it lands in. Complements per-document chunking (q62): chunking
  * splits one document, packing lays the whole corpus end-to-end.
  *
  * Scale shape — a global running sum WITHOUT a single-partition
  * window: `Window.orderBy(...)` with no partition key plans an
  * `Exchange SinglePartition`, a straight scale-killer at 100 TB. Here
  * the cumsum is two-phase, the textbook distributed prefix sum:
  *   1. range-partition + sort by the document key (one exchange; P
  *      ordered runs),
  *   2. per-partition running sums in parallel windows keyed on
  *      `spark_partition_id()`,
  *   3. per-partition TOTALS (P rows, P = shuffle partitions — bounded
  *      by cluster config, not data) collected, prefix-summed on the
  *      driver, and BROADCAST-JOINED back as per-partition base
  *      offsets. The join build side is the P-row offset frame, so the
  *      stream side keeps its partitioning (no exchange) and the
  *      per-row work is one hash probe — NOT a P-branch `when` chain,
  *      which at cluster partition counts (P in the thousands) blows
  *      past codegen method limits and degrades to interpreted
  *      evaluation of a P-deep expression per row.
  * The slim (id, n_toks) projection is localCheckpointed before step 3
  * so the sort executes ONCE (the totals action and the final read both
  * reuse it) — two longs per row, not the corpus text.
  */
object Packing {

  /** Assign each document its global token interval [tok_start,
    * tok_end) under concat order `idCol`, and the bin range
    * [bin_start, bin_end] it occupies at `budget` tokens per bin.
    * Zero-token documents get the empty interval at their offset
    * (bin_end = bin_start). */
  def packTokens(docs: DataFrame, idCol: String, tokCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "packTokens needs a positive token budget")
    val slim = docs
      .select(col(idCol).as("__id"), tokCol.cast("long").as("n_toks"))
      .repartitionByRange(col("__id"))
      .sortWithinPartitions("__id")
      .withColumn("__pid", spark_partition_id())
    val wp = Window.partitionBy("__pid").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Materialize the sorted slim projection once: the totals collect
    // below and the final output both read these partitions.
    val local = slim.withColumn("__local", sum("n_toks").over(wp))
      .localCheckpoint(true)
    // P rows — one per shuffle partition, never corpus-proportional.
    val totals = local.groupBy("__pid")
      .agg(max("__local").as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(
      pids.map(totals).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetDf =
      offsets.toSeq.sorted.toDF("__pid", "__off")
    local
      .join(broadcast(offsetDf), "__pid")
      .withColumn("tok_end", col("__off") + col("__local"))
      .withColumn("tok_start", col("tok_end") - col("n_toks"))
      .withColumn("bin_start", expr(s"tok_start div ${budget}L"))
      .withColumn("bin_end",
        expr(s"greatest(tok_start, tok_end - 1L) div ${budget}L"))
      .select(col("__id").as(idCol), col("n_toks"), col("tok_start"),
        col("tok_end"), col("bin_start"), col("bin_end"))
  }
}
