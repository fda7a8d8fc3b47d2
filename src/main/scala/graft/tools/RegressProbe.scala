package graft.tools

import org.apache.spark.sql.SparkSession

/** Directed interleaved re-measure for flagged bench regressions (the
  * Q55Probe discipline, generalized): run the named queries
  * round-robin (A,B,anchor, A,B,anchor, ...) in ONE fresh JVM with
  * GC between runs, print per-query medians. Interleaving makes host
  * drift hit every query equally, and the anchor (a query that did
  * NOT move between rounds) turns absolute seconds into a host-rate
  * denominator: if the flagged query's median/anchor-median ratio
  * matches the prior round's ratio, the "regression" was host or
  * suite-context (cross-query heap pressure in the 109-query bench
  * JVM), not plan shape.
  *
  * Usage: RegressProbe [sfDir] q10_pivot q34_rollup q04_pricing_summary
  * (last name = anchor; default query set is the round-7 flagged pair).
  */
object RegressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (d, names) =
      if (args.length >= 2) (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.1",
        Seq("q10_pivot", "q34_rollup", "q04_pricing_summary"))
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "7").toInt
    val defs = names.map(n =>
      n -> graft.testqueries.Registry.all.find(_.name == n).get)
    def once(q: graft.testqueries.QueryDef): Double = {
      System.gc()
      val t0 = System.nanoTime()
      q.run(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    defs.foreach { case (_, q) => once(q) } // warm the scans + codegen
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      defs.foreach { case (n, q) => times(n) = times(n) :+ once(q) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    val anchorMed = med(times(names.last))
    names.foreach { n =>
      val v = times(n)
      println(f"REGRESS $n med=${med(v)}%.3f min=${v.min}%.3f " +
        f"max=${v.max}%.3f ratio_vs_anchor=${med(v) / anchorMed}%.2f")
    }
    spark.stop()
  }
}
