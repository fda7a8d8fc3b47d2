package graft

import org.apache.spark.sql.functions._
import graft.ops.Mixing
import graft.functions.Fns

class MixingSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val docs = (0 until 30).map { i =>
    (i.toLong, s"src${i % 3}", s"text $i")
  }.toDF("doc_id", "source", "text") // 10 docs per src0/src1/src2

  test("integer-multiple targets are hit EXACTLY (full epochs only)") {
    val out = Mixing.mixCorpus(docs, "source", "doc_id",
      Map("src0" -> 30L, "src1" -> 10L))
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("src0" -> 30L, "src1" -> 10L)) // 3x and 1x
    // src0 rows appear exactly 3 times each, copies 0,1,2
    val copies = out.filter(col("source") === "src0")
      .groupBy("doc_id").agg(count(lit(1)).as("k"),
        sort_array(collect_list(col("copy"))).as("cs")).collect()
    assert(copies.forall(_.getLong(1) == 3L))
    assert(copies.forall(_.getSeq[Long](2) == Seq(0L, 1L, 2L)))
  }

  test("fractional epoch: bounded, deterministic, matches the hash rule") {
    val out = Mixing.mixCorpus(docs, "source", "doc_id",
      Map("src1" -> 25L)) // 10 rows: 2 full epochs + 5/10 fractional
    val n = out.count()
    assert(n >= 20 && n <= 30)
    // every row keeps at least its two full epochs
    assert(out.groupBy("doc_id").count().collect()
      .forall(r => r.getLong(1) >= 2L))
    // the fractional copy matches an independent evaluation of the rule
    val expectExtra = docs.filter(col("source") === "src1")
      .filter(pmod(Fns.portableHash60(
        concat_ws(":", lit("mix"), lit(2L), col("doc_id").cast("string"))),
        lit(10L)) < lit(5L)).count()
    assert(n == 20 + expectExtra)
    // retry-stability: a second run is bit-identical
    val again = Mixing.mixCorpus(docs, "source", "doc_id",
      Map("src1" -> 25L))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("domains absent from the target map are dropped; zero target ok") {
    val out = Mixing.mixCorpus(docs, "source", "doc_id",
      Map("src0" -> 5L, "src2" -> 0L))
    assert(out.filter(col("source") =!= "src0").count() == 0)
  }

  test("mixByProportion rounds per-domain budgets") {
    val out = Mixing.mixByProportion(docs, "source", "doc_id",
      Map("src0" -> 0.5, "src1" -> 0.5), totalRows = 40L)
    // each domain targets 20 of 10 rows = exactly 2 full epochs
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("src0" -> 20L, "src1" -> 20L))
  }

  test("shufflePosition: stable per salt, reshuffled across salts") {
    val a = docs.select(col("doc_id"),
      Mixing.shufflePosition(col("doc_id"), "e0").as("pos"))
    val b = docs.select(col("doc_id"),
      Mixing.shufflePosition(col("doc_id"), "e0").as("pos"))
    assert(a.exceptAll(b).isEmpty)
    val ordA = a.orderBy("pos", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val ordB = docs.select(col("doc_id"),
        Mixing.shufflePosition(col("doc_id"), "e1").as("pos"))
      .orderBy("pos", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ordA != ordB) // 30!-to-1 against by accident
    assert(ordA.sorted == ordB.sorted)
  }
}
