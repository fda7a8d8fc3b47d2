package graft.tools
import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of AQE's shuffle over-partitioning knob.
  *
  * Hypothesis under test (round 9): the sf3→sf10 superlinear knee on
  * the heavy shuffle/window/agg queries (q50 5.1×, q22 9.5×, q93 4.3×
  * per 3.33× data in `scaling_fit_r8.md`) is PARTITION VOLUME, not plan
  * shape — `spark.sql.shuffle.partitions=32` pins every exchange to 32
  * partitions, so at sf10 a window sort gets ~2M rows per partition and
  * starts spilling. AQE can only coalesce partitions DOWN; with
  * `initialPartitionNum` unset it can never split an oversized non-skew
  * shuffle. Setting
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` high
  * makes partition SIZE the bounded quantity (advisory 64 MB) at every
  * scale: small SFs coalesce back to few partitions, big SFs fan out.
  * `SQLConf.numShufflePartitions` returns the initial number whenever
  * AQE+coalesce are enabled, so the knob reaches user
  * `repartition(col)` exchanges (q50) too.
  *
  * Both knobs are runtime SQL confs, so the A/B alternates them inside
  * ONE session with interleaved reps (RegressProbe discipline — host
  * noise comes in multi-second windows; interleaving decorrelates it).
  *
  * Usage: PartsProbe <sfDir> <q1,q2,...> [initialPartitionNum] [reps]
  */
object PartsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val initN = if (args.length > 2) args(2).toInt else 256
    val reps = if (args.length > 3) args(3).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val qs = names.map(n => graft.testqueries.Registry.all
      .find(_.name == n).getOrElse(sys.error(s"unknown query $n")))
    def run(q: graft.testqueries.QueryDef): Double = {
      System.gc()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both variants once (JIT + codegen + footer reads)
    qs.foreach { q =>
      spark.conf.unset(key); run(q)
      spark.conf.set(key, initN.toString); run(q)
      spark.conf.unset(key)
    }
    val a = collection.mutable.Map.empty[String, List[Double]]
    val b = collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      qs.foreach { q =>
        spark.conf.unset(key)
        a(q.name) = run(q) :: a.getOrElse(q.name, Nil)
        spark.conf.set(key, initN.toString)
        b(q.name) = run(q) :: b.getOrElse(q.name, Nil)
        spark.conf.unset(key)
      }
    }
    qs.foreach { q =>
      val (av, bv) = (a(q.name), b(q.name))
      def stats(xs: List[Double]) = {
        val s = xs.sorted
        // true median for even rep counts (upper-element alone biases up)
        val med = if (s.size % 2 == 1) s(s.size / 2)
          else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
        f"min=${xs.min}%.2f med=$med%.2f"
      }
      println(f"PARTS_PROBE ${q.name} sf=$sfDir initN=$initN " +
        f"A[32] ${stats(av)}  B[$initN] ${stats(bv)}  " +
        f"ratio(minB/minA)=${bv.min / av.min}%.3f")
    }
    spark.stop()
  }
}
