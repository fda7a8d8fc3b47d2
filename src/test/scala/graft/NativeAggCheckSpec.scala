package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Fns
import graft.plans.{KeyedMinAgg, ObservationStepAgg, OrderedSigAgg,
  TraceFingerprintAgg}

/** Scalacheck properties for the native TypedImperativeAggregates:
  * generated inputs (Unicode collation edges, NULL ords/values, empty
  * strings, duplicate keys), generated PARTITION COUNTS and generated
  * per-partition ROW ORDER, always compared against the composed
  * built-in forms they replaced. The seeded adversarial fixtures live
  * in PlansSpec; these properties exist so merge-boundary placement is
  * not chosen by a hand-picked seed but searched by the generator —
  * a partial-merge bug (buffer order leaking into the result, a
  * non-associative combine) fails here even if no fixture seed hits it.
  */
class NativeAggCheckSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  /** UTF-16/UTF-8 order divergence (U+FFFF vs supplementary plane),
    * JSON-escaping hazards, empties, controls, NULL. */
  private val torture: Seq[String] = Seq(
    "a", "", "\"quote\"", "back\\slash", "nl\nlf\ttabvt",
    "中文", "￿", "𐀀" /* U+10000 */, "😀", "z~",
    " lead", "trail ", null)

  private val valueGen: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf(torture),
    2 -> Gen.asciiPrintableStr.map(_.take(12)),
    1 -> Gen.const(null: String))

  /** A data set + a partitioning: rows, shuffle seed, partition count.
    * The property must hold for EVERY (seed, k) — that is the
    * adversarial-merge claim. */
  private case class Shaped[A](rows: List[A], seed: Long, k: Int)

  private def shapedGen[A](row: Gen[A]): Gen[Shaped[A]] = for {
    n <- Gen.choose(20, 120)
    rows <- Gen.listOfN(n, row)
    seed <- Gen.choose(0L, 1000000L)
    k <- Gen.choose(1, 32)
  } yield Shaped(rows, seed, k)

  private def shape(df: DataFrame, s: Shaped[_]): DataFrame =
    df.orderBy(rand(s.seed)).repartition(s.k)

  /** GRAFT_CHECK_TRIALS multiplies the per-property trial count for
    * deep local sweeps (e.g. =20 → 240 trials); CI default keeps the
    * suite fast. Failures print the full scalacheck status (args +
    * shrink result) before the assert. */
  private def check(prop: Prop, trials: Int = 12): Unit = {
    val mult = sys.env.getOrElse("GRAFT_CHECK_TRIALS", "1").toInt
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(trials * mult).withWorkers(1), prop)
    if (!res.passed) println(s"SCALACHECK-FAILURE: ${res.status}")
    assert(res.passed, res.status.toString)
  }

  test("OrderedSigAgg == md5(to_json(orderedCollect)) for all " +
      "partitionings (scalacheck)") {
    val row = for {
      g <- Gen.choose(0, 7).map(i => s"g$i")
      o <- Gen.frequency(9 -> Gen.choose(0, 5).map(Option(_)),
        1 -> Gen.const(Option.empty[Int]))
      v <- valueGen
    } yield (g, o, v)
    check(Prop.forAll(shapedGen(row)) { s =>
      val df = shape(s.rows.toDF("g", "o", "v"), s)
      df.groupBy("g").agg(
          OrderedSigAgg.sig(col("o"), col("v")).as("native"),
          md5(to_json(Fns.orderedCollect(col("o"), col("v"))))
            .as("composed"))
        .collect().forall(r => r.getString(1) == r.getString(2))
    })
  }

  test("KeyedMinAgg == groupBy+min ground truth for all partitionings " +
      "(scalacheck)") {
    val row = for {
      g <- Gen.choose(0, 5).map(i => s"k$i")
      key <- valueGen
      v <- valueGen
    } yield (g, key, v)
    check(Prop.forAll(shapedGen(row)) { s =>
      val df = shape(s.rows.toDF("g", "key", "v"), s)
      val got = df.groupBy("g")
        .agg(KeyedMinAgg.keyedMin(col("key"), col("v")).as("m"))
        .select(col("g"), explode(col("m")).as(Seq("key", "minv")))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val truth = df.filter(col("key").isNotNull && col("v").isNotNull)
        .groupBy("g", "key").agg(min(col("v")).as("minv"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      got == truth
    })
  }

  test("TraceFingerprintAgg: values partition-independent, membership " +
      "== composed two-stage chain (scalacheck)") {
    val row = for {
      impl <- Gen.choose(0, 7).map(i => s"impl$i")
      t <- Gen.choose(0, 3).map(i => s"t$i")
      r <- Gen.choose(0, 1).map(i => s"r$i")
      step <- Gen.frequency(11 -> Gen.choose(0, 5).map(Option(_)),
        1 -> Gen.const(Option.empty[Int]))
      out <- valueGen
    } yield (impl, t, r, step, out)
    def membership(fps: Seq[(String, String)]): Set[Set[String]] =
      fps.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    check(Prop.forAll(shapedGen(row)) { s =>
      val base = s.rows.toDF("impl", "test", "run", "step", "out")
      def fps(df: DataFrame): Seq[(String, String)] =
        df.groupBy("impl")
          .agg(TraceFingerprintAgg.fingerprint(col("test"), col("run"),
            col("step"), col("out")).as("fp"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
      val atK = fps(shape(base, s))
      val atOne = fps(base.repartition(1))
      val composed = base.groupBy("impl", "test", "run")
        .agg(md5(to_json(Fns.orderedCollect(col("step"), col("out"))))
          .as("sig"))
        .groupBy("impl")
        .agg(md5(to_json(Fns.orderedCollect(
          struct(col("test"), col("run")), md5(col("sig"))))).as("fp"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
      atK.toMap == atOne.toMap && membership(atK) == membership(composed)
    }, trials = 10)
  }

  test("ObservationStepAgg == composed five-aggregate regroup for all " +
      "partitionings (scalacheck)") {
    // X is a spreadsheet column coordinate — non-null by construction
    // (arena.py cell exports); VALUE/EXECUTIONTIME are nullable.
    val row = for {
      g <- Gen.choose(0, 5).map(i => s"s$i")
      x <- Gen.choose(0, 9)
      typ <- Gen.oneOf("op", "input_value", "value", "meta")
      v <- valueGen
      et <- Gen.frequency(3 -> Gen.choose(0, 999).map(i =>
        Option(i.toDouble)), 1 -> Gen.const(Option.empty[Double]))
      oracle <- Gen.oneOf(true, false)
    } yield (g, x, typ, v, et, oracle)
    check(Prop.forAll(shapedGen(row)) { s =>
      val df = shape(
        s.rows.toDF("g", "x", "typ", "v", "et", "oracle"), s)
      val native = df.groupBy("g")
        .agg(ObservationStepAgg.agg(col("x"), col("typ"), col("v"),
          col("et"), col("oracle")).as("c"))
        .select(col("g"), col("c.inputs"), col("c.output"),
          col("c.operation"), col("c.execution_time_ms"),
          col("c.specified_oracle"))
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getString(2), r.getString(3),
            if (r.isNullAt(4)) null else r.getDouble(4),
            if (r.isNullAt(5)) null else r.getBoolean(5))).toMap
      val composed = df.groupBy("g")
        .agg(
          nullif(Fns.orderedStringAgg(col("x"),
            when(col("typ") === "input_value", col("v")), ","), lit(""))
            .as("inputs"),
          nullif(Fns.orderedStringAgg(col("x"),
            when(col("typ") === "value", col("v")), ","), lit(""))
            .as("output"),
          max(when(col("typ") === "op", col("v"))).as("operation"),
          max(col("et")).cast("double").as("execution_time_ms"),
          max(col("oracle")).as("specified_oracle"))
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getString(2), r.getString(3),
            if (r.isNullAt(4)) null else r.getDouble(4),
            if (r.isNullAt(5)) null else r.getBoolean(5))).toMap
      native == composed
    }, trials = 10)
  }

  test("KmvAgg == sorted-distinct-take-k ground truth for all " +
      "partitionings (scalacheck)") {
    import graft.plans.KmvAgg
    // duplicate-heavy keys so the dedup-in-buffer path is exercised
    // across merge boundaries; NULL hashes must be skipped
    val row = for {
      g <- Gen.choose(0, 4).map(i => s"g$i")
      v <- Gen.frequency(
        9 -> Gen.choose(0L, 40L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
    } yield (g, v)
    check(Prop.forAll(shapedGen(row)) { s =>
      val df = shape(s.rows.toDF("g", "v"), s)
      val h = Fns.hashBase(col("v").cast("string"))
      val k = 2 + (s.k % 8) // vary the sketch size with the shape too (>= 2)
      val got = df.groupBy("g")
        .agg(KmvAgg.kmv(h, k).as("mins"))
        .as[(String, Seq[Long])].collect().toMap
      val truth = df.filter(col("v").isNotNull)
        .select(col("g"), h.as("h")).distinct()
        .as[(String, Long)].collect()
        .groupBy(_._1)
        .map { case (g, rows) =>
          g -> rows.map(_._2).distinct.sorted.take(k).toSeq
        }
      // every group appears (all-null groups with an EMPTY min-set),
      // and each min-set equals the sorted distinct head exactly
      got.keySet == s.rows.map(_._1).toSet &&
        got.forall { case (g, m) => m == truth.getOrElse(g, Seq.empty) }
    })
  }
}
