package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, OrderedStringAggregator}
import graft.plans.{GitBlobHashExpr, GraftExtensions}

class PlansSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def registerNative(): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      GitBlobHashExpr.identifier, GitBlobHashExpr.info,
      GitBlobHashExpr.builder)

  private val tricky = Seq(
    "plain text",
    "crlf\r\nline  \n\n",
    "trailing spaces   ",
    "tabs\t\t\nmore \t \n\n\n",
    "中文 multibyte ≠ ascii",
    "")

  test("native GitBlobHashExpr equals the built-in column form") {
    registerNative()
    val rows = tricky.toDF("s").select(
      Fns.gitBlobHash(col("s")).as("builtin"),
      expr("graft_git_blob_hash(s)").as("native"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("GitBlobHashExpr evaluates under codegen over many rows") {
    registerNative()
    val out = (1 to 1000).map(i => s"content $i\r\n x ").toDF("s")
      .selectExpr("graft_git_blob_hash(s) AS h").collect()
    assert(out.map(_.getString(0)).distinct.length == 1000)
    assert(out.forall(_.getString(0).length == 64))
  }

  test("extensions object applies its function injection cleanly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder proven above
  }

  test("builder casts non-string inputs (implicit-cast behavior)") {
    registerNative()
    val viaInt = Seq(42).toDF("n")
      .selectExpr("graft_git_blob_hash(n) AS h").collect().head.getString(0)
    val viaStr = Seq("42").toDF("s")
      .selectExpr("graft_git_blob_hash(s) AS h").collect().head.getString(0)
    assert(viaInt == viaStr)
  }

  test("OrderedStringAggregator matches Fns.orderedStringAgg") {
    val agg = udaf(new OrderedStringAggregator)
    val df = Seq((1, 3, "c"), (1, 1, "a"), (1, 2, null),
      (1, 1, "b"), (2, 5, "z")).toDF("k", "o", "v")
    val out = df.groupBy("k")
      .agg(agg(col("o"), col("v")).as("via_udaf"),
        Fns.orderedStringAgg(col("o"), col("v"), ",").as("via_builtin"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[String]("via_udaf") == r.getAs[String]("via_builtin"))
    }
    val k1 = out.find(_.getInt(0) == 1).get
    assert(k1.getAs[String]("via_udaf") == "a,b,c")
  }
}
