package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Deterministic sampling operators. `rand()`-based sampling is
  * nondeterministic across retries and re-plans (a task retry resamples
  * — rows can be double-counted or lost); these hash a stable key
  * instead, so the same row makes the same decision on every executor,
  * every retry, every engine ([[Fns.portableHash60]] is
  * DuckDB-replayable, which also makes the sample oracle-checkable).
  */
object Sampling {

  private val M = 1000000L

  /** Uniform keyed sample: keep `fraction` of rows, decided by
    * `hash(key) mod 1e6` — deterministic and stable under retries. */
  def sample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame =
    df.filter(u(keyCol) < math.round(fraction * M))

  /** Stratified keyed sample: per-stratum fractions (e.g. downsample
    * dominant languages, keep the tail whole — the rebalancing step of
    * a pretraining mix). Strata absent from `fractions` keep
    * `default`. The when-chain is a per-row expression; no join, no
    * shuffle, no RNG state. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, keyCol: Column,
      fractions: Map[String, Double],
      default: Double = 1.0): DataFrame = {
    val threshold = fractions.foldLeft(
      lit(math.round(default * M))) { case (acc, (stratum, f)) =>
      when(stratumCol === stratum, lit(math.round(f * M))).otherwise(acc)
    }
    df.filter(u(keyCol) < threshold)
  }

  /** Per-row weighted sample: keep each row with its OWN probability
    * `permille / 1000` (importance/quality-proportional sampling — the
    * rebalancing knob when the keep rate is a per-document score, not a
    * per-stratum constant). `permille` is an integer column in
    * [0, 1000]; the decision compares `hash(salt:key) mod 1000` against
    * it, so the whole predicate is integer arithmetic — bit-identical
    * across engines and retries, with none of the FP-threshold edge
    * cases a `rand() < p` filter has. 1000 keeps the same row on a
    * strictly larger permille (monotone: raising a document's weight
    * never drops it from the sample). */
  def weightedSample(df: DataFrame, keyCol: Column, permille: Column,
      salt: String): DataFrame =
    df.filter(
      pmod(Fns.portableHash60(concat(lit(s"$salt:"),
        keyCol.cast("string"))), lit(1000L)) < permille)

  /** Per-group quota: keep the top `quota` rows of each group under a
    * caller-supplied TOTAL order (rank columns must end in a unique
    * tie-break — the q01/q03 lesson: a non-unique sort order is an
    * engine-dependent sample). The crawl-curation cap — "at most N
    * documents per domain, best-quality first" — that stops one giant
    * host from dominating a pretraining mix.
    *
    * One exchange on the group key, then a per-partition sort +
    * running row_number — no global sort, no driver state; the hot-host
    * skew ceiling is the largest single group's sort, which is the same
    * bound any per-group top-N pays. */
  def groupQuota(df: DataFrame, groupCol: Column, quota: Int,
      rank: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(groupCol).orderBy(rank: _*)))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** `hash(key) mod 1e6` in `[0, 1e6)` — the sampling uniformizer. */
  private def u(keyCol: Column): Column =
    pmod(Fns.portableHash60(keyCol.cast("string")), lit(M))
}
