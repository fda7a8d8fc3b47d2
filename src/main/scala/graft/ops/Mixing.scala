package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Corpus mixture construction — the "data mixing" step that turns a
  * curated pool into a pretraining corpus with a TARGET composition
  * (so many rows of web, so many of code, ...), including upsampling
  * (epochs > 1) of scarce high-quality domains. The reference has no
  * such operator (its pipeline stops at per-problem analytics); this is
  * part of the training-data extension surface alongside
  * [[Sampling]]/[[Dedup]].
  *
  * Determinism discipline: like [[Sampling]], every keep/replicate
  * decision hashes a stable row key ([[Fns.portableHash60]]) — stable
  * under task retries and re-plans, and exactly replayable by the
  * DuckDB oracle. All rate arithmetic is INTEGER-only (copies = target
  * div n, remainder threshold on hash mod n), so there is no
  * floating-point rounding to diverge between engines: the expected
  * output size per domain is exactly `target`.
  *
  * Scale shape: one tiny aggregation (per-domain counts, grouped on a
  * low-cardinality column) broadcast back onto the corpus, then one
  * codegen'd per-row projection + explode. No window over a domain (a
  * per-domain rank would put an entire domain — terabytes — into one
  * task), no corpus-sized shuffle at all: the output inherits the
  * scan's partitioning.
  */
object Mixing {

  /** Mix the corpus to `targets`: for each domain value, emit (in
    * expectation, exactly) `targets(domain)` rows, replicating rows
    * `copy = 0..k` when the domain must be upsampled. Domains absent
    * from `targets` are dropped. Output = input columns + `copy`.
    *
    * Per row of a domain with `n` source rows and target `t`:
    * copies `0 until t div n` are always kept (full epochs), and one
    * extra copy (`copy = t div n`) is kept iff
    * `hash(salt:copy:key) mod n < t mod n` — a deterministic Bernoulli
    * with rational probability (t mod n)/n, so per-domain expected
    * output is `(t div n) * n + (t mod n) = t` with no float anywhere.
    */
  def mixCorpus(df: DataFrame, domainCol: String, keyCol: String,
      targets: Map[String, Long], salt: String = "mix"): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0),
      "mixCorpus needs non-negative per-domain targets")
    val pool = df.filter(col(domainCol).isin(targets.keys.toSeq: _*))
    // Tiny by construction: one row per mixture domain. Broadcast it
    // back; the corpus side never shuffles.
    val counts = pool.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val target = targets.foldLeft(lit(0L)) { case (acc, (d, t)) =>
      when(col(domainCol) === d, lit(t)).otherwise(acc)
    }
    pool.join(broadcast(counts), domainCol)
      .withColumn("__t", target)
      .withColumn("__copies", expr("__t div __n"))
      .withColumn("__rem", col("__t") % col("__n"))
      .withColumn("copy",
        explode(sequence(lit(0L), col("__copies"))))
      .filter(col("copy") < col("__copies") ||
        pmod(Fns.portableHash60(concat_ws(":", lit(salt), col("copy"),
          col(keyCol).cast("string"))), col("__n")) < col("__rem"))
      .drop("__n", "__t", "__copies", "__rem")
  }

  /** [[mixCorpus]] with a proportions-and-budget surface: domain d gets
    * `round(proportions(d) * totalRows)` target rows. Proportions need
    * not sum to 1 (the caller may mix a subset of domains). */
  def mixByProportion(df: DataFrame, domainCol: String, keyCol: String,
      proportions: Map[String, Double], totalRows: Long,
      salt: String = "mix"): DataFrame =
    mixCorpus(df, domainCol, keyCol,
      proportions.map { case (d, p) => d -> math.round(p * totalRows) },
      salt)

  /** Deterministic global shuffle position for training order: a stable
    * 60-bit hash of (salt, key) — reshuffle by changing the salt, never
    * by rand(). Writing in this order (repartitionByRange(pos) +
    * sortWithinPartitions — a parallel range sort, one exchange) gives
    * every epoch a reproducible, retry-stable permutation and spreads
    * [[mixCorpus]] replicas of the same row far apart (their positions
    * hash the copy number too, via distinct key strings).
    */
  def shufflePosition(keyCol: Column, salt: String): Column =
    Fns.portableHash60(concat_ws(":", lit(salt), keyCol.cast("string")))
}
