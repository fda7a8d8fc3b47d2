package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fns
import graft.testqueries.{QueryDef, Tables}

/** Directed same-JVM A/B for the round-9 q56 rewrite: document
  * frequency from a second `distinct().groupBy` pass over the exploded
  * words (round-8 form, two corpus scans — the branches don't
  * canonicalize equal so exchange reuse can't collapse them) vs df
  * derived from the tf aggregate (round-9 form, ReusedExchange, one
  * scan). Interleaved reps, GC between runs, medians — the RegressProbe
  * discipline. Also answers VERDICT r8's q56 drift question (1.49 s ->
  * 2.13 s at sf1 between rounds 7 and 8): both forms ran identical code
  * in r7 and r8, so if OLD's median here lands back near the r7 number
  * on a quiet host, the drift was environment, not plan shape.
  *
  * Usage: runMain graft.tools.Q56Probe [sfDir]   (GRAFT_PROBE_REPS=7)
  */
object Q56Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "7").toInt

    def words: DataFrame = Tables.documents(spark, d)
      .select(col("doc_id"), explode(Fns.words(col("text"))).as("w"))
    def finish(tf: DataFrame, df: DataFrame): DataFrame =
      tf.join(df, "w")
        .crossJoin(broadcast(
          Tables.documents(spark, d).agg(count(lit(1)).as("n"))))
        .select(col("doc_id"), col("w"), col("tf"),
          round(col("tf") * log(col("n") / col("df")), 6).as("tfidf"))
        .transform(QueryDef.sortedP(_, col("doc_id"), col("w")))
    def oldForm: DataFrame = {
      val w = words
      val tf = w.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = w.distinct().groupBy("w").agg(count(lit(1)).as("df"))
      finish(tf, df)
    }
    def newForm: DataFrame = {
      val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("w")
        .agg(count(when(col("tf") >= 1, 1)).as("df"))
      finish(tf, df)
    }
    val forms = Seq("old_two_scan" -> (() => oldForm),
      "new_reused_exchange" -> (() => newForm))
    def once(mk: () => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    forms.foreach { case (_, mk) => once(mk) } // warm scans + codegen
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      forms.foreach { case (n, mk) => times(n) = times(n) :+ once(mk) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    forms.foreach { case (n, _) =>
      val v = times(n)
      println(f"Q56_PROBE $n%-20s median=${med(v)}%.3f s " +
        f"min=${v.min}%.3f max=${v.max}%.3f reps=$reps sf=$d")
    }
    println(f"Q56_PROBE ratio new/old = " +
      f"${med(times("new_reused_exchange")) / med(times("old_two_scan"))}%.3f")
    spark.stop()
  }
}
