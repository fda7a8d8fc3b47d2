package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.queries.CanonicalQueries

class ScaleOpsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("salted join equals the unsalted join (skew mitigation)") {
    val large = (1 to 500).map(i =>
      (if (i % 10 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
      .toDF("k", "tag")
    val salted = Skew.saltedJoin(large, small, Seq("k"), 8)
      .orderBy("k", "v").collect()
    val plain = large.join(small, "k").orderBy("k", "v").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("salted join: duplicate dim keys, null keys, and hot-key spread") {
    // duplicate keys on the REPLICATED side: each dup must match every
    // probe row exactly once per dup (replication cannot double-count)
    val large = (1 to 300).map(i =>
      (if (i % 3 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val dimDup = Seq(("hot", "H1"), ("hot", "H2"), ("k1", "A"))
      .toDF("k", "tag")
    val salted = Skew.saltedJoin(large, dimDup, Seq("k"), 4)
      .orderBy("k", "v", "tag").collect()
    val plain = large.join(dimDup, "k").orderBy("k", "v", "tag").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)

    // null join keys: inner-join semantics drop them on both forms
    val largeN = Seq((null.asInstanceOf[String], 1), ("a", 2))
      .toDF("k", "v")
    val dimN = Seq(("a", "A"), (null.asInstanceOf[String], "N"))
      .toDF("k", "tag")
    val saltedN = Skew.saltedJoin(largeN, dimN, Seq("k"), 4).collect()
    assert(saltedN.map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSeq == Seq(("a", 2, "A")))

    // the salt actually SPREADS a hot key: with 100 distinct rows under
    // one key and saltFactor 8, the per-row hash must hit >1 bucket
    // (this is the whole point — a constant salt would be a no-op)
    val hot = (1 to 100).map(i => ("hot", i)).toDF("k", "v")
    val buckets = hot.withColumn("salt",
        pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("salt").distinct().count()
    assert(buckets > 4, s"hot key spread over only $buckets/8 buckets")
  }

  test("key histogram surfaces heavy keys") {
    val df = (1 to 100).map(i => if (i <= 60) "hot" else s"k$i")
      .toDF("k")
    val top = Skew.keyHistogram(df, Seq("k"), 1).collect().head
    assert(top.getString(0) == "hot" && top.getLong(1) == 60)
  }

  test("approx dataset stats agree with exact on small cardinalities") {
    val exact = CanonicalQueries.datasetStats(Fixtures.observations)
      .collect().head
    val approx = CanonicalQueries
      .datasetStats(Fixtures.observations, approx = true).collect().head
    // HLL is exact at these cardinalities (3 impls, 2 tests)
    assert(approx.getAs[Long]("total_implementations") ==
      exact.getAs[Long]("total_implementations"))
    assert(approx.getAs[Double]("avg_tests_per_problem") ==
      exact.getAs[Double]("avg_tests_per_problem"))
  }

  test("compaction rewrites each partition into one file, same data") {
    val wh = tmpDir("whcompact")
    val lake = new graft.lake.Lakehouse(spark, wh)
    (1 to 4).foreach { _ =>
      lake.append("observations", Fixtures.observations,
        graft.schema.Schemas.observations)
    }
    def files = new java.io.File(
      s"$wh/observations/data_set_id=HumanEval/problem_id=p1")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 4)
    val before = lake.observations.orderBy("implementation_id", "test_id",
      "step_id", "run_id").collect().map(_.toSeq).toSeq
    lake.compact("observations", graft.schema.Schemas.observations)
    assert(files == 1)
    val after = lake.observations.orderBy("implementation_id", "test_id",
      "step_id", "run_id").collect().map(_.toSeq).toSeq
    assert(after == before)
  }

  test("streaming dedup drops repeated keys within the watermark") {
    val srcDir = tmpDir("dedup-src")
    val outDir = tmpDir("dedup-out")
    val ckDir = tmpDir("dedup-ck")
    import TestSpark.spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    Seq((1L, ts0, "a"), (1L, ts0, "a"), (2L, ts0, "b"), (1L, ts0, "a"))
      .toDF("k", "ts", "v").coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val deduped = graft.streaming.EventsStreaming.dedupStream(
      spark.readStream.schema(schema).parquet(srcDir), Seq("k"))
    val q = deduped.writeStream
      .option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outDir).start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 2)
    assert(out.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("bucketed tables join without a shuffle") {
    val wh = tmpDir("whbucket")
    val lake = new graft.lake.Lakehouse(spark, wh)
    lake.writeBucketed("obs_b", Fixtures.observations,
      graft.schema.Schemas.observations, Seq("implementation_id"), 4)
    lake.writeBucketed("code_b", Fixtures.code,
      graft.schema.Schemas.codeImplementations,
      Seq("implementation_id"), 4)
    val spark2 = spark
    // disable broadcast so the join strategy decision is about bucketing
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark2.table("obs_b")
        .join(spark2.table("code_b"), Seq("implementation_id"))
        .groupBy("implementation_id").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(j.count() == 3)
    } finally {
      spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark2.sql("DROP TABLE obs_b")
      spark2.sql("DROP TABLE code_b")
    }
  }

  test("lakehouse SQL DDL: create external table + partition discovery") {
    val wh = tmpDir("whddl")
    val lake = new graft.lake.Lakehouse(spark, wh)
    lake.append("observations", Fixtures.observations,
      graft.schema.Schemas.observations)
    lake.createTable("obs_ddl", graft.schema.Schemas.observations,
      location = s"$wh/observations")
    assert(spark.sql("SELECT count(*) FROM obs_ddl").collect()
      .head.getLong(0) == 12)
    // out-of-band append to a NEW partition, then repair discovers it
    lake.append("observations",
      Fixtures.observations.withColumn("problem_id", lit("p2")),
      graft.schema.Schemas.observations)
    lake.repairTable("obs_ddl")
    assert(spark.sql(
      "SELECT count(*) FROM obs_ddl WHERE problem_id = 'p2'").collect()
      .head.getLong(0) == 12)
    spark.sql("DROP TABLE obs_ddl")
  }
}
