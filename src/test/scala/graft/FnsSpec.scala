package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class FnsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("portableHash60 matches the DuckDB-computable value") {
    // DuckDB: SELECT ('0x' || substr(md5('abc'),1,15))::BIGINT
    val h = Seq("abc").toDF("s").select(Fns.portableHash60(col("s")))
      .collect().head.getLong(0)
    assert(h == 648541476951500027L)
  }

  test("gitBlobHash matches a reference sha256 of 'blob <len>\\0<body>'") {
    val text = "hello \r\nworld  \n\n"
    // normalized: "hello\nworld" (CRLF->LF, trailing ws + blank lines cut)
    val expectBody = "blob 11\u0000hello\nworld"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(expectBody.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = Seq(text).toDF("s").select(Fns.gitBlobHash(col("s")))
      .collect().head.getString(0)
    assert(got == expect)
  }

  test("normalization handles lone CR, VT and FF like Python rstrip") {
    // reference normalize_source: '\r'->'\n' too; rstrip() strips \x0b/\f
    val text = "line1  \nline2\u000b\n\nx\r\ntrail\r"
    // normalized: "line1\nline2\n\nx\ntrail" (17 bytes)
    val got = Seq(text).toDF("s").select(Fns.gitBlobHash(col("s")))
      .collect().head.getString(0)
    assert(got ==
      "70d9baf12fa9d600187b2db511c834e89160025f91133d72a222ce19ee6b7e74")
  }

  test("normalization strips Unicode whitespace like Python rstrip") {
    // NEL / NBSP / LS / ideographic+hair space at line ends are Python
    // `str.isspace()` whitespace: rstrip() removes them. LS/PS are NOT
    // line terminators for Python split('\n') — a mid-line LS must
    // survive (the (?d) UNIX_LINES flag pins Java's (?m)$ to \n only).
    val text = "a\u0085\n" +      // trailing NEL
      "b \u00a0\n" +              // space + NBSP
      "mid\u2028kept\n" +         // LS mid-line: must survive
      "c\u3000\u200a\n" +        // ideographic + hair space
      "d\u202f\u001c\n" +        // NNBSP + FS control
      "e\u2029"                    // trailing PS, no final LF
    val norm = "a\nb\nmid\u2028kept\nc\nd\ne"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(
      (s"blob ${norm.getBytes("UTF-8").length}\u0000" + norm)
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Seq(text).toDF("s").select(Fns.gitBlobHash(col("s")))
      .collect().head.getString(0)
    assert(got == expect)
    // the native expression's JVM regex chain must agree bit-for-bit
    assert(graft.plans.GitBlobHashExpr.hash(text, sha1 = false) == expect)
  }

  test("gitBlobHash uses byte length for multibyte text") {
    val text = "中文"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(s"blob 6\u0000中文".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = Seq(text).toDF("s").select(Fns.gitBlobHash(col("s")))
      .collect().head.getString(0)
    assert(got == expect)
  }

  test("orderedCollect is invariant to input row order (property)") {
    (1 to 10).foreach { _ =>
      val rows = List.fill(8)((rnd.nextInt(6),
        rnd.alphanumeric.take(3).mkString))
      val a = rows.toDF("o", "v").groupBy(lit(1))
        .agg(Fns.orderedCollect(col("o"), col("v")).as("xs"))
        .collect().head.getAs[scala.collection.Seq[String]]("xs")
      val b = rnd.shuffle(rows).toDF("o", "v")
        .groupBy(lit(1))
        .agg(Fns.orderedCollect(col("o"), col("v")).as("xs"))
        .collect().head.getAs[scala.collection.Seq[String]]("xs")
      assert(a == b)
      assert(a == rows.sorted.map(_._2))
    }
  }

  test("orderedStringAgg skips nulls like DuckDB string_agg") {
    val out = Seq((1, Some("a")), (2, None: Option[String]),
        (3, Some("c"))).toDF("o", "v")
      .groupBy(lit(1))
      .agg(Fns.orderedStringAgg(col("o"), col("v"), ",").as("s"))
      .collect().head.getString(1)
    assert(out == "a,c")
  }

  test("cosine of identical vectors is 1") {
    val v = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val c = v.select(Fns.cosine(col("a"), col("b"))).collect().head
      .getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("shingles produce overlapping n-grams") {
    val out = Seq("a b c d").toDF("t")
      .select(Fns.shingles(Fns.words(col("t")), 3).as("sh"))
      .collect().head.getAs[scala.collection.Seq[String]]("sh")
    assert(out == Seq("a b c", "b c d"))
  }

  test("shingles of short text are empty, words of blank are empty") {
    val sh = Seq("a b").toDF("t")
      .select(Fns.shingles(Fns.words(col("t")), 3).as("sh"))
      .collect().head.getAs[scala.collection.Seq[String]]("sh")
    assert(sh.isEmpty)
    val w = Seq("   ").toDF("t").select(Fns.words(col("t")).as("w"))
      .collect().head.getAs[scala.collection.Seq[String]]("w")
    assert(w.isEmpty)
  }

  test("sumDec is exact under permutation (property)") {
    (1 to 5).foreach { _ =>
      val xs = List.fill(12)(rnd.nextInt(100000) / 100.0)
      val a = xs.toDF("x").agg(Fns.sumDec(col("x"))).collect()
        .head.getDouble(0)
      val b = rnd.shuffle(xs).toDF("x").agg(Fns.sumDec(col("x")))
        .collect().head.getDouble(0)
      assert(a == b)
    }
  }

  test("sumMicro/100.0 == sumDec on 2dp fixed-point values (property)") {
    // the fast-exact path must agree with the unconditional-exact path
    // bit-for-bit on in-domain inputs, permutation included
    (1 to 5).foreach { _ =>
      val xs = List.fill(200)(rnd.nextInt(10000000) / 100.0)
      val dec = xs.toDF("x").agg(Fns.sumDec(col("x"))).collect()
        .head.getDouble(0)
      val micro = rnd.shuffle(xs).toDF("x")
        .agg((Fns.sumMicro(col("x")) / 100.0).as("s")).collect()
        .head.getDouble(0)
      assert(micro == dec)
    }
  }

  test("q115 micro pricing summary == q04 decimal form, all columns") {
    val sf = "/root/testdata/sf0.01"
    def rows(name: String) = graft.testqueries.Registry.all
      .find(_.name == name).get.run(TestSpark.spark, sf)
      .orderBy("l_returnflag", "l_linestatus").collect()
    val a = rows("q04_pricing_summary")
    val b = rows("q115_pricing_summary_micro")
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0) &&
        x.getString(1) == y.getString(1))
      // sum_qty, sum_base_price, sum_disc_price, avg_qty — bit-equal
      (2 to 5).foreach(i =>
        assert(x.getDouble(i) == y.getDouble(i), s"col $i"))
      assert(x.getLong(6) == y.getLong(6))
    }
  }
}
