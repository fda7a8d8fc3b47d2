package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning — the runtime-row-level-filter
  * idea (Spark's `InjectRuntimeFilter`) surfaced as an operator the
  * caller controls.
  *
  * At 100 TB the win is SHUFFLE VOLUME: a fact-side scan that shuffles
  * only rows whose key might exist on the (mid-size, not
  * broadcast-able) build side moves `selectivity + fpp` of the bytes a
  * plain shuffle join moves. The filter is exact-safe: false positives
  * are removed by the join itself, so `prunedEquiJoin` returns
  * bit-identical results to the plain join (oracle q67), never fewer
  * rows. Build cost is one distributed aggregate over the build keys
  * (`BloomFilterAggregate`, merged per-partition sketches) and the
  * probe is a codegen'd per-row test (`BloomFilterMightContain`, the
  * expression pair Spark's own optimizer injects when its thresholds
  * and join shapes line up — here available unconditionally, e.g.
  * below a non-equi post-filter or a custom operator the optimizer
  * rule does not match).
  */
object BloomPrune {

  /** Distributed bloom build over `build`'s `key` column: per-partition
    * sketches merged into one filter, returned serialized (V1 format —
    * `might_contain` compatible). `numBits` defaults to ~8 bits/item
    * (≈2% fpp). Returns null when `build` is empty — [[mightContain]]
    * then rejects every row, which matches the empty exact join. */
  def buildFilter(build: DataFrame, key: Column,
      expectedItems: Long, numBits: Long = -1L): Array[Byte] = {
    val bits = if (numBits > 0) numBits else math.max(64L, expectedItems * 8)
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(ColumnBridge.expression(key)), 42L),
      Literal(expectedItems), Literal(bits)).toAggregateExpression()
    build.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe predicate over the serialized filter (null filter = empty
    * build side → constant false). Codegen'd; the filter deserializes
    * once per task, not per row. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter == null) lit(false)
    else ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      XxHash64(Seq(ColumnBridge.expression(key)), 42L)))

  /** Exact inner equi-join with bloom pre-pruning of the probe side.
    * Result is identical to `probe.join(build, probeKey === buildKey)`
    * — the join clears false positives — but only `might_contain`
    * survivors reach the join's exchange. */
  def prunedEquiJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    val bf = buildFilter(build, buildKey, expectedItems)
    probe.filter(mightContain(bf, probeKey))
      .join(build, probeKey === buildKey)
  }
}
