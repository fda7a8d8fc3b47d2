package graft

import org.apache.spark.sql.functions._
import graft.ops.Rollups

/** Bit parity of the re-agg grouping-sets decomposition against the
  * native GROUP BY GROUPING SETS plan, on data with NULL group keys
  * (the case where COALESCE-based masquerades diverge from the real
  * operator — grouping flags are the only way to tell a NULL key cell
  * from the ALL cell, and both paths must agree on them). */
class RollupsSpec extends SparkSpec {
  import spark.implicits._

  private def sampleDf = {
    val rnd = new scala.util.Random(7)
    val flags = Seq("A", "N", "R", null)
    val status = Seq("O", "F", null)
    (1 to 5000).map { i =>
      (flags(rnd.nextInt(flags.size)), status(rnd.nextInt(status.size)),
        BigDecimal(rnd.nextInt(10000)) / 100)
    }.toDF("rf", "ls", "qty")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .toSeq.sorted

  test("groupingSetsReAgg == native GROUPING SETS (counts, sums, flags)") {
    val df = sampleDf
    df.createOrReplaceTempView("v_rollups_spec")
    val native = spark.sql(
      """SELECT rf, ls,
           CAST(grouping(rf) AS INT) AS grouping_rf,
           CAST(grouping(ls) AS INT) AS grouping_ls,
           COUNT(*) AS n,
           SUM(CAST(qty AS DECIMAL(28,2))) AS total
         FROM v_rollups_spec
         GROUP BY GROUPING SETS ((rf, ls), (ls), ())""")
    val reagg = Rollups.groupingSetsReAgg(
        df,
        keys = Seq("rf", "ls"),
        baseAggs = Seq(count(lit(1)).as("pn"),
          sum(col("qty").cast("decimal(28,2)")).as("pq")),
        reAggs = Seq(sum(col("pn")).as("n"), sum(col("pq")).as("total")),
        sets = Seq(Seq("rf", "ls"), Seq("ls"), Seq.empty))
      .select("rf", "ls", "grouping_rf", "grouping_ls", "n", "total")
    assert(canon(reagg) == canon(native))
  }

  test("single-set degenerate case equals a plain GROUP BY") {
    val df = sampleDf
    val plain = df.groupBy("rf")
      .agg(count(lit(1)).as("n"), max(col("qty")).as("mx"))
      .withColumn("grouping_rf", lit(0))
      .select("rf", "grouping_rf", "n", "mx")
    val reagg = Rollups.groupingSetsReAgg(
        df, keys = Seq("rf"),
        baseAggs = Seq(count(lit(1)).as("pn"), max(col("qty")).as("pm")),
        reAggs = Seq(sum(col("pn")).as("n"), max(col("pm")).as("mx")),
        sets = Seq(Seq("rf")))
      .select("rf", "grouping_rf", "n", "mx")
    assert(canon(reagg) == canon(plain))
  }

  test("rejects a grouping set outside the base keys") {
    intercept[IllegalArgumentException] {
      Rollups.groupingSetsReAgg(sampleDf, Seq("rf"),
        Seq(count(lit(1)).as("pn")), Seq(sum(col("pn")).as("n")),
        Seq(Seq("ls")))
    }
  }
}
