package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected catalog queries —
  * the SURVEY-mandated plan review (pushdown, broadcast, shuffle count).
  * Usage: runMain graft.tools.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSet else Set.empty[String]
    val d = "/root/testdata/sf0.01"
    graft.testqueries.Registry.all
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        q.run(spark, d).explain("formatted")
      }
    spark.stop()
  }
}
