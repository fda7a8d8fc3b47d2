package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's measured tuning — the
  * one-liner entry point a reference user gets from
  * `ObservationLakehouse(...)`. Both profiles register
  * [[graft.plans.GraftExtensions]], so `graft_git_blob_hash`,
  * `graft_git_blob_sha1` and `graft_vec_dot` work from plain SQL.
  *
  * `batch`: full-parallelism analytics. Shuffle partitions sized to the
  * core count (not Spark's default 200 — measured pure overhead at
  * single-node scale; on a real cluster pass `shufflePartitions` ≈ 2-3×
  * total cores). AQE on (skew splitting, partition coalescing). The
  * ObjectHashAggregate fallback threshold is raised from its 128-key
  * default — the silent 2.3× cliff on every collect_list-family
  * aggregation this engine's ordered traces rely on.
  *
  * `interactive`: the pruned per-problem latency profile. One shuffle
  * partition (a pruned problem partition is a few hundred rows) and AQE
  * off — its per-exchange re-plan + materialization is fixed latency
  * with nothing to adapt at this size. Combine with
  * `CanonicalQueries.interactive` on the pruned input for single-stage
  * execution.
  *
  * `getOrCreate` caveat (Spark semantics, not graft's): if a session is
  * already active in the JVM, it is returned as-is and this factory's
  * configs/extensions do NOT apply — build the graft session first.
  */
object GraftSession {

  /** Sum of regular-file sizes under `dir` — the input-size estimate that
    * gates the AQE over-partitioning knob. Below [[overPartitionBytes]]
    * the 8× fan-out buys nothing (everything coalesces back down) but
    * still pays scheduler/fetch overhead per exchange — measured +2.7%
    * on the 17 MB sf0.1 suite when the knob shipped ungated in round 9.
    */
  def inputBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => java.nio.file.Files.isRegularFile(p))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    }
  }

  /** Scan-size threshold above which over-partitioning pays for itself:
    * at ≥1 GiB input a single exchange's partitions outgrow AQE's 64 MB
    * advisory target at cores-count partitioning, which is exactly when
    * size-bounded partitions start cutting straggler exposure (the
    * PartsProbe A/B evidence in Bench.scala). Below it the knob is pure
    * fan-out overhead on data that fits one advisory partition per core.
    */
  val overPartitionBytes: Long = 1L << 30

  private def base(master: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")

  def batch(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession =
    base(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      // Over-partition 8x and let AQE coalesce to its advisory size:
      // without this, AQE can only merge partitions DOWN from
      // shufflePartitions, so partition VOLUME grows linearly with the
      // data. A/B'd in tools/PartsProbe (sf10, four heaviest queries):
      // quiet-host min neutral (0.94-1.04x), but medians under
      // concurrent load drop hard (q22 69.9->44.1s) — size-bounded
      // partitions cut straggler exposure, the property that matters
      // on a shared cluster. Small inputs coalesce back to few
      // partitions, so the fan-out costs nothing at interactive sizes.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        8 * shufflePartitions)
      .getOrCreate()

  def interactive(master: String = "local[*]"): SparkSession =
    base(master)
      .config("spark.sql.shuffle.partitions", 1)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
}
