package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected catalog queries —
  * the SURVEY-mandated plan review (pushdown, broadcast, shuffle count).
  * Usage: runMain graft.tools.Explain [queryName ...]
  *
  * GRAFT_EXPLAIN_EXECUTED=1 additionally materializes each query (noop
  * write) and prints the FINAL adaptive plan: AQE decisions —
  * ReusedExchange/stage reuse, runtime broadcast flips, coalesced
  * partitions — only exist there, never in the static explain.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSet else Set.empty[String]
    val executed = sys.env.get("GRAFT_EXPLAIN_EXECUTED").contains("1")
    val d = "/root/testdata/sf0.01"
    graft.testqueries.Registry.all
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        val df = q.run(spark, d)
        df.explain("formatted")
        if (executed) {
          // Materialize THIS df's own QueryExecution: a noop write
          // would plan a separate WriteFiles execution and leave
          // df.queryExecution un-run (printing an AQE plan that never
          // finalized). toRdd drives the same executedPlan instance.
          df.queryExecution.toRdd.count()
          println(s"---- ${q.name}: executed (final adaptive) plan ----")
          println(df.queryExecution.executedPlan.toString)
        }
      }
    spark.stop()
  }
}
