package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-binary, same-session A/B for the q45 fix (round-8): multiset
  * set-op CARDINALITIES via `ops/Multiset` count arithmetic vs the
  * built-in `exceptAll`/`intersectAll` + recount, whose
  * sum-of-±counts rewrite ends in `Generate(ReplicateRows)` — on a
  * ≤3-value key the pre-Generate Exchange hashes to ≤3 tasks and the
  * Generate re-materializes corpus-sized row counts out of ≤6 buffer
  * rows through those tasks, only for the downstream count to collapse
  * them again. Cross-round bench deltas can hide host drift; this
  * probe runs both forms interleaved in ONE JVM on the same input and
  * asserts the outputs are identical rows before timing them.
  *
  * Usage: runMain graft.tools.SetOpProbe <sfDir> [reps]
  */
object SetOpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val a = li.select(col("l_returnflag").as("f"))
    val b = li.filter(col("l_linestatus") === "O")
      .select(col("l_returnflag").as("f"))

    def arith() = graft.ops.Multiset.setOpCounts(a, b, Seq("f"))
      .orderBy("op", "f")
    def arith2pass() = graft.ops.Multiset.exceptAllCounts(a, b, Seq("f"))
      .withColumn("op", lit("except_all"))
      .unionByName(graft.ops.Multiset.intersectAllCounts(a, b, Seq("f"))
        .withColumn("op", lit("intersect_all")))
      .orderBy("op", "f")
    def replicated() = a.exceptAll(b).groupBy("f").agg(count(lit(1))
        .as("n")).withColumn("op", lit("except_all"))
      .unionByName(a.intersectAll(b).groupBy("f")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all")))
      .orderBy("op", "f")

    // compare on (f, op, n) value sets — the three forms emit the same
    // columns in different declaration orders
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("f", "op", "n").collect().map(_.toSeq).toSeq
    val ra = rows(arith())
    val ra2 = rows(arith2pass())
    val rb = rows(replicated())
    require(ra == rb && ra == ra2, s"forms disagree:\n$ra\n$ra2\n$rb")
    println(s"SETOP_PROBE rows_identical=true n=${ra.size} dir=$dir")

    def time(label: String, mk: () => org.apache.spark.sql.DataFrame)
        : Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SETOP_PROBE $label%-12s min=${ts.min}%6.2f s " +
        f"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // interleaved so neither form owns a warmer cache
    time("arith", () => arith())
    time("arith2pass", () => arith2pass())
    time("replicated", () => replicated())
    time("arith", () => arith())
    spark.stop()
  }
}
