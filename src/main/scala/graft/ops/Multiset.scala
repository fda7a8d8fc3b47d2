package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiset (bag) set-operation CARDINALITIES via count arithmetic.
  *
  * Spark rewrites `exceptAll` / `intersectAll` as a union of ±1
  * counts followed by `Generate(ReplicateRows)` — it re-materializes
  * one output ROW per surviving multiplicity before any downstream
  * aggregate can count them back down. For a count-consumer on a
  * low-cardinality key that is a scale-killer: the pre-Generate
  * Exchange hashes on the key (≤ k distinct values → ≤ k tasks) and
  * the Generate expands corpus-sized row counts out of k buffer rows
  * through those few tasks. Measured on q45 at sf10: 97.5 s for 6
  * output rows, single-task stragglers, while the equivalent count
  * arithmetic is a pair of fully-parallel partial aggregations.
  *
  * The identities (per key group, SQL bag semantics — set ops group
  * NULL keys as equal, exactly like GROUP BY):
  *   |A EXCEPT ALL B|(k)    = max(a_n(k) − b_n(k), 0)
  *   |A INTERSECT ALL B|(k) = min(a_n(k), b_n(k))
  * A key appears in the output iff its cardinality is > 0 — the same
  * rows a `groupBy(keys).count` over the ReplicateRows form produces,
  * with no row ever replicated: both sides reduce map-side to one row
  * per key BEFORE the exchange, and the join is key-cardinality-sized.
  */
object Multiset {

  /** Per-key counts of both sides, full-outer joined, absent → 0.
    * Output: keys*, a_n, b_n. */
  private def keyCounts(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame = {
    val ca = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("a_n"))
    val cb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("b_n"))
    // NULL-SAFE join condition (<=>): set ops group NULL keys as
    // equal, and a plain equi-join would split a NULL group into two
    // unmatched rows (except count too high, intersect row lost).
    // EqualNullSafe still plans as a hash-join key. Counts on a
    // missing side are NULL → 0; both inputs are post-aggregation
    // (one row per distinct key), so the join cost is key-sized.
    val cond = keys.map(k => ca(k) <=> cb(k)).reduce(_ && _)
    ca.join(cb, cond, "full_outer")
      .select(keys.map(k => coalesce(ca(k), cb(k)).as(k)) ++ Seq(
        coalesce(col("a_n"), lit(0L)).as("a_n"),
        coalesce(col("b_n"), lit(0L)).as("b_n")): _*)
  }

  /** `SELECT keys*, count(*) AS n FROM (a EXCEPT ALL b) GROUP BY keys`
    * without materializing a single replicated row. */
  def exceptAllCounts(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame =
    keyCounts(a, b, keys)
      .select(keys.map(col) :+
        greatest(col("a_n") - col("b_n"), lit(0L)).as("n"): _*)
      .filter(col("n") > 0)

  /** `SELECT keys*, count(*) AS n FROM (a INTERSECT ALL b) GROUP BY
    * keys` without materializing a single replicated row. */
  def intersectAllCounts(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame =
    keyCounts(a, b, keys)
      .select(keys.map(col) :+
        least(col("a_n"), col("b_n")).as("n"): _*)
      .filter(col("n") > 0)

  /** Both cardinalities from ONE count pass: (keys*, op, n) with op ∈
    * {except_all, intersect_all}. Unioning [[exceptAllCounts]] and
    * [[intersectAllCounts]] plans the scans and count aggregations
    * TWICE (exchange reuse may or may not collapse them at runtime);
    * here the shared key-count join is computed once and the two
    * derived cardinalities leave it as a 2-row `stack` per key —
    * deterministic single-pass shape, no reliance on the reuse
    * optimizer. */
  def setOpCounts(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame =
    keyCounts(a, b, keys)
      .select(keys.map(col) :+ expr(
        """stack(2,
             'except_all', greatest(a_n - b_n, 0L),
             'intersect_all', least(a_n, b_n)) AS (op, n)"""): _*)
      .filter(col("n") > 0)
}
