package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sketches, TextAnalysis}

/** Log-histogram quantiles and containment-scored decontamination. */
class StatOpsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def bucketsOf(vs: Seq[Long]): Map[Long, Long] =
    vs.toDF("v").select(Sketches.logBucket(col("v")).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap

  test("logBucket: exact below 32, monotone, 16 minors per major") {
    // values 0..31 are their own bucket
    assert(bucketsOf((0L until 32L)).keySet == (0L until 32L).toSet)
    // bucket is monotone non-decreasing in v and floor(v) recovers a
    // value <= v with relative error < 1/16
    val vs = Seq(31L, 32L, 33L, 63L, 64L, 100L, 1000L, 123456789L,
      Long.MaxValue / 2)
    val rows = vs.toDF("v")
      .select(col("v"), Sketches.logBucket(col("v")).as("b"))
      .select(col("v"), col("b"),
        Sketches.bucketFloor(col("b")).as("lb"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    rows.sliding(2).foreach { case Array(a, b) => assert(a._2 <= b._2) }
    rows.foreach { case (v, _, lb) =>
      assert(lb <= v, s"floor $lb above value $v")
      assert(v - lb <= lb / 16 + 1, s"bucket too wide at $v (lb=$lb)")
    }
  }

  test("bucketFloor is the smallest value in its bucket") {
    // for each tested value, floor's own bucket is the same bucket,
    // and floor-1 (when >= 0) maps strictly below
    val vs = Seq(0L, 1L, 31L, 32L, 47L, 48L, 63L, 64L, 65L, 999L,
      4096L, 1234567L)
    val df = vs.toDF("v")
      .select(Sketches.logBucket(col("v")).as("b"))
      .select(col("b"), Sketches.bucketFloor(col("b")).as("lb"))
      .select(col("b"), col("lb"),
        Sketches.logBucket(col("lb")).as("b2"),
        when(col("lb") > 0,
          Sketches.logBucket(col("lb") - 1)).as("bPrev"))
    df.as[(Long, Long, Long, Option[Long])].collect().foreach {
      case (b, lb, b2, bPrev) =>
        assert(b2 == b, s"floor $lb of bucket $b maps to $b2")
        bPrev.foreach(p => assert(p < b, s"floor-1 of $lb not below $b"))
    }
  }

  test("histogram merge == histogram of union (mergeable state)") {
    val xs = (1L to 500L).map(i => ("a", i * i % 9973))
    val ys = (1L to 300L).map(i => ("a", i * 7 % 50))
    val hx = Sketches.logHistogram(xs.toDF("g", "v"), Seq("g"), col("v"))
    val hy = Sketches.logHistogram(ys.toDF("g", "v"), Seq("g"), col("v"))
    val merged = hx.union(hy).groupBy("g", "bucket")
      .agg(sum("cnt").as("cnt"))
    val direct = Sketches.logHistogram((xs ++ ys).toDF("g", "v"),
      Seq("g"), col("v"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("quantiles of merged histograms == quantiles of one-shot (monoid)") {
    val xs = (1L to 700L).map(i => ("g", i * 31 % 10007))
    val ys = (1L to 300L).map(i => ("g", i * 17 % 300))
    def hist(vs: Seq[(String, Long)]) =
      Sketches.logHistogram(vs.toDF("g", "v"), Seq("g"), col("v"))
    val merged = hist(xs).union(hist(ys))
      .groupBy("g", "bucket").agg(sum("cnt").as("cnt"))
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val a = Sketches.histQuantiles(merged, Seq("g"), qs).collect().toSeq
    val b = Sketches.histQuantiles(hist(xs ++ ys), Seq("g"), qs)
      .collect().toSeq
    assert(a == b)
  }

  test("histQuantiles: rank semantics exact, error bound vs true quantile") {
    val vs = (1L to 1000L).map(i => ("g", i * 13 % 4096))
    val hist = Sketches.logHistogram(vs.toDF("g", "v"), Seq("g"), col("v"))
    val out = Sketches.histQuantiles(hist, Seq("g"),
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .as[(String, Long, Long, Long, Long)].collect().head
    val sortedVs = vs.map(_._2).sorted
    def trueQ(num: Int, den: Int): Long = {
      val r = (sortedVs.size.toLong * num + den - 1) / den // ceil rank
      sortedVs((r - 1).toInt)
    }
    assert(out._2 == 1000L)
    for ((est, (num, den)) <- Seq(out._3 -> (1, 2), out._4 -> (9, 10),
        out._5 -> (99, 100))) {
      val t = trueQ(num, den)
      // the estimate is the floor of the bucket holding the true
      // rank-th value: <= t, within one bucket width
      assert(est <= t, s"estimate $est above true $t")
      assert(t - est <= est / 16 + 1, s"estimate $est too far from $t")
    }
  }

  test("contaminationScore: counts, fraction threshold, both verdicts") {
    val corpus = Seq(
      // doc 1: 5 words = two 4-grams, one shared with the benchmark
      (1L, "alpha beta gamma delta epsilon"),
      // doc 2: verbatim benchmark copy -> containment 100%
      (2L, "alpha beta gamma delta"),
      // doc 3: no overlap
      (3L, "one two three four five six"),
      // doc 4: too short for a 4-gram -> absent from the output
      (4L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.contaminationScore(corpus, bench,
        "doc_id", "text", n = 4, thresholdPct = 50)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, true), // 1/2 = 50% >= 50%
      (2L, 1L, 1L, true),
      (3L, 3L, 0L, false)))
  }

  test("kmv: exact below k, duplicates don't consume slots") {
    // 40 distinct values, each repeated 25 times: distinct < k=64, so
    // the min-set IS the distinct hash set and the estimate is exact
    val rows = for (i <- 1L to 40L; _ <- 1 to 25) yield ("g", i)
    val out = Sketches.kmvDistinct(rows.toDF("g", "v"), Seq("g"),
        col("v"), 64)
      .as[(String, Long)].collect().head
    assert(out._2 == 40L)
  }

  test("kmv: estimate within expected error above k") {
    val rows = (1L to 2000L).map(i => ("g", i))
    val out = Sketches.kmvDistinct(rows.toDF("g", "v"), Seq("g"),
        col("v"), 64)
      .as[(String, Long)].collect().head
    // se ~ 1/sqrt(62) = 12.7%; 3 sigma = 38% — deterministic data,
    // so this is a regression pin, not a flaky probabilistic bound
    assert(math.abs(out._2 - 2000L) <= 2000L * 38 / 100,
      s"estimate ${out._2} too far from 2000")
  }

  test("kmv merge == kmv of union (mergeable state)") {
    import graft.plans.KmvAgg
    import graft.functions.Fns
    val xs = (1L to 500L).map(i => ("g", i))
    val ys = (400L to 900L).map(i => ("g", i))
    def mins(vs: Seq[(String, Long)]) =
      vs.toDF("g", "v").groupBy("g")
        .agg(KmvAgg.kmv(Fns.hashBase(col("v").cast("string")), 32)
          .as("mins"))
    // merge = union the min-sets and re-sketch their elements
    val merged = mins(xs).union(mins(ys))
      .select(col("g"), explode(col("mins")).as("h"))
      .groupBy("g").agg(KmvAgg.kmv(col("h"), 32).as("mins"))
      .as[(String, Seq[Long])].collect().head
    val direct = mins(xs ++ ys).as[(String, Seq[Long])].collect().head
    assert(merged._2 == direct._2)
  }

  test("kmv window rollup is lossless: merged per-window min-sets == global") {
    import graft.plans.KmvAgg
    import graft.functions.Fns
    // 3 windows with overlapping user sets
    val rows = for (w <- 1 to 3; u <- 1L to 400L; if (u + w) % 3 != 0)
      yield (w, u)
    val df = rows.toDF("w", "u")
    val h = Fns.hashBase(col("u").cast("string"))
    val daily = df.groupBy("w").agg(KmvAgg.kmv(h, 16).as("mins"))
    val rolled = daily.select(explode(col("mins")).as("h"))
      .agg(KmvAgg.kmv(col("h"), 16).as("mins"))
      .as[Seq[Long]].collect().head
    val global = df.agg(KmvAgg.kmv(h, 16).as("mins"))
      .as[Seq[Long]].collect().head
    assert(rolled == global)
  }

  test("kmv survives partial-aggregate serialization round trips") {
    import graft.plans.KmvAgg
    import graft.functions.Fns
    val df = (1L to 300L).map(i => ("g", i)).toDF("g", "v")
      .repartition(7) // force partial buffers + exchange merges
    val a = df.groupBy("g")
      .agg(KmvAgg.kmv(Fns.hashBase(col("v").cast("string")), 16)
        .as("mins"))
      .as[(String, Seq[Long])].collect().head
    val b = df.coalesce(1).groupBy("g")
      .agg(KmvAgg.kmv(Fns.hashBase(col("v").cast("string")), 16)
        .as("mins"))
      .as[(String, Seq[Long])].collect().head
    assert(a._2 == b._2 && a._2.size == 16)
    assert(a._2 == a._2.sorted)
  }

  test("contaminationScore: integer threshold boundary is exact") {
    // 3 shingles, 1 shared = 33.3%: flagged at 33, clean at 34
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d")).toDF("doc_id", "text")
    def verdict(pct: Int): Boolean =
      TextAnalysis.contaminationScore(corpus, bench, "doc_id", "text",
          n = 4, thresholdPct = pct)
        .select("contaminated").as[Boolean].collect().head
    assert(verdict(33) && !verdict(34))
  }
}
