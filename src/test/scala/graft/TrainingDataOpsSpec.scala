package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TextAnalysis}

/** Exact substring dedup (span stream / dup detection / removal),
  * unigram-LM scoring, BM25 ranking, and weighted sampling. */
class TrainingDataOpsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val docs = Seq(
    (1L, "a b c a b c d"),
    (2L, "a b c x y"),
    (3L, "q r s"))
    .toDF("doc_id", "text")

  test("spanStream: 1-based positions, every window, short docs none") {
    val sp = TextAnalysis.spanStream(docs, "doc_id", "text", 3)
      .orderBy("id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(sp.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, "a b c"), (1L, 2L, "b c a"), (1L, 3L, "c a b"),
      (1L, 4L, "a b c"), (1L, 5L, "b c d")))
    assert(sp.filter(_._1 == 3L).map(_._3).toSeq == Seq("q r s"))
    // 2-word doc yields no 3-spans
    val short = Seq((9L, "a b")).toDF("doc_id", "text")
    assert(TextAnalysis.spanStream(short, "doc_id", "text", 3).count() == 0)
  }

  test("dupSpanStarts: minDf counts DISTINCT docs, not in-doc repeats") {
    // 'a b c' occurs twice in doc 1 and once in doc 2 -> df = 2 docs
    val d2 = TextAnalysis.dupSpanStarts(docs, "doc_id", "text", 3, 2)
      .orderBy("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d2.toSeq == Seq((1L, 1L), (1L, 4L), (2L, 1L)))
    // minDf = 3 needs three distinct docs -> nothing qualifies
    assert(TextAnalysis.dupSpanStarts(docs, "doc_id", "text", 3, 3)
      .count() == 0)
  }

  test("removeDupSpans: interval coverage, overlap, untouched docs") {
    val out = TextAnalysis.removeDupSpans(docs, "doc_id", "text", 3, 2)
      .select("doc_id", "n_removed", "clean_text")
      .orderBy("doc_id").collect()
    // doc 1: spans at 1 and 4 cover positions 1-6 -> only 'd' survives
    assert(out(0).getLong(1) == 6L && out(0).getString(2) == "d")
    // doc 2: span at 1 covers 1-3 -> 'x y'
    assert(out(1).getLong(1) == 3L && out(1).getString(2) == "x y")
    // doc 3: no dup spans -> intact, zero removed
    assert(out(2).getLong(1) == 0L && out(2).getString(2) == "q r s")
  }

  test("removeDupSpans: fully-duplicated doc -> NULL clean_text") {
    val twins = Seq((1L, "p q r"), (2L, "p q r")).toDF("doc_id", "text")
    val out = TextAnalysis.removeDupSpans(twins, "doc_id", "text", 3, 2)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_removed") == 3L)
      assert(r.getAs[String]("clean_text") == null)
    }
  }

  test("unigramLmScore: hand-computed nll on a 2-doc corpus") {
    // corpus: a a a b -> p(a)=3/4, p(b)=1/4
    val d = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmScore(d, "doc_id", "text")
      .orderBy("id").collect()
    val nllA = BigDecimal(-math.log(3.0 / 4.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val nllB = BigDecimal(-math.log(1.0 / 4.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Long]("n_words") == 3L)
    assert(math.abs(out(0).getAs[Double]("lm_nll") - nllA) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("lm_nll") - nllB) < 1e-9)
    // rare-word doc scores HIGHER (the filter's sort direction)
    assert(out(1).getAs[Double]("lm_nll") > out(0).getAs[Double]("lm_nll"))
  }

  test("bm25Rank: tf and rarity ordering, absent terms contribute zero") {
    val d = Seq(
      (1L, "spark spark spark x y z"), // high tf for 'spark'
      (2L, "spark x y z w v"), // single hit
      (3L, "join x y z w v"), // rarer term ('join' df=1 < 'spark' df=2)
      (4L, "x y z w v u")) // no query terms -> absent from ranking
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(d, "doc_id", "text",
      Seq("spark", "join"), topK = 10).collect()
    val byId = out.map(r => r.getAs[Long]("id") ->
      r.getAs[Double]("bm25")).toMap
    assert(!byId.contains(4L))
    // same doc length: tf 3 > tf 1 for the same term
    assert(byId(1L) > byId(2L))
    // equal tf/len: the rarer term's idf wins
    assert(byId(3L) > byId(2L))
    out.foreach(r => assert(r.getAs[Double]("bm25") > 0.0))
  }

  test("weightedSample: endpoints, monotone in weight, deterministic") {
    val d = (1L to 400L).toDF("k").withColumn("w0", lit(0L))
    assert(Sampling.weightedSample(d, col("k"), lit(0L), "s").count() == 0)
    assert(Sampling.weightedSample(d, col("k"), lit(1000L), "s")
      .count() == 400)
    val half = Sampling.weightedSample(d, col("k"), lit(500L), "s")
      .collect().map(_.getLong(0)).toSet
    val more = Sampling.weightedSample(d, col("k"), lit(800L), "s")
      .collect().map(_.getLong(0)).toSet
    // monotone: every row kept at 500 survives at 800
    assert(half.subsetOf(more))
    assert(half.size > 100 && half.size < 300) // ~200 expected
    // replay-stable: same salt, same set
    val again = Sampling.weightedSample(d, col("k"), lit(500L), "s")
      .collect().map(_.getLong(0)).toSet
    assert(again == half)
    // a different salt draws a different set
    val other = Sampling.weightedSample(d, col("k"), lit(500L), "t")
      .collect().map(_.getLong(0)).toSet
    assert(other != half)
  }
}
