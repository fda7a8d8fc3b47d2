package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each user, the
  * earliest time each stage of an ORDERED sequence of event types is
  * reached, where stage k only counts events STRICTLY after the user's
  * stage-(k-1) time. The reference's analytics stop at per-problem
  * aggregation (`/root/reference/olake/stats.py` has no sequential
  * operator); funnels are part of the events extension surface next to
  * sessionization (q29) and gap-fill (q71).
  *
  * Scale shape: ONE hash exchange on the user key + one sort, then k
  * chained running-min window passes over the same sorted run (Catalyst
  * plans consecutive Window nodes over an identical
  * partitioning/ordering without re-sorting), and a final partial
  * aggregation down to one row per user. No self-joins — the naive
  * formulation joins the event table once per stage (k corpus-sized
  * shuffles); this is the q29 discipline applied to sequential state.
  *
  * Correctness of the running-min chain: rows are scanned in `us` order,
  * so when a stage-k candidate row at time t asks "has stage k-1
  * happened strictly before t", every stage-(k-1) candidate with value
  * < t sits at an earlier row (its row time IS its value). The running
  * min therefore equals the final per-user min whenever the strict
  * comparison can pass — ties at t == t_{k-1} are excluded by
  * strictness on both sides.
  */
object Funnels {

  /** Per-user stage-reach times for `stages`; `t0..t{k-1}` micros
    * columns, null where the user never reaches the stage. */
  def userStageTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val evs = events.select(
      col(userCol).as("u"),
      expr(s"unix_micros(cast($tsCol as timestamp))").as("us"),
      col(typeCol).as("et"))
    val w = Window.partitionBy("u").orderBy("us", "et")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chained = stages.zipWithIndex.foldLeft(evs) {
      case (df, (st, i)) =>
        val cand =
          if (i == 0) when(col("et") === st, col("us"))
          else when(col("et") === st &&
            col("us") > col(s"__r${i - 1}"), col("us"))
        df.withColumn(s"__r$i", min(cand).over(w))
    }
    chained.groupBy(col("u").as(userCol))
      .agg(min(col("__r0")).as("t0"),
        stages.indices.drop(1).map(i =>
          min(col(s"__r$i")).as(s"t$i")): _*)
  }

  /** Funnel summary: one row per stage with the number of users whose
    * ordered path reaches it and the total micros from each user's
    * stage-0 time (exact integer sum — no FP to diverge between
    * engines). `n_users` is non-increasing in `stage` by construction.
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val per = userStageTimes(events, userCol, tsCol, typeCol, stages)
    // k is tiny (a funnel has a handful of stages): unpivot the k
    // per-user columns with one explode — no per-stage scans.
    val stageRows = per.select(explode(array(
      stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i).as("stage"), lit(st).as("stage_name"),
          col(s"t$i").as("t"), col("t0").as("t0"))
      }: _*)).as("s"))
      .select(col("s.*"))
    stageRows.filter(col("t").isNotNull)
      .groupBy(col("stage"), col("stage_name"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("t") - col("t0")).as("sum_us_from_start"))
      .orderBy("stage")
  }
}
