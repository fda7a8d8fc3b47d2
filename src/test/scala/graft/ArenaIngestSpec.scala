package graft

import graft.ingest.ArenaIngest

class ArenaIngestSpec extends SparkSpec {

  test("observation regroup: ordered inputs/outputs, conditional extraction") {
    val obs = ArenaIngest.observationsFromArena(Fixtures.rawArena, "DS")
      .orderBy("implementation_id", "step_id")
      .collect()
    // sysA step 0 + step 1; oracle rows excluded at ingest (arena.py:103)
    assert(obs.length == 2)
    assert(!obs.exists(_.getAs[String]("implementation_id")
      .startsWith("oracle")))
    val step0 = obs.find(r =>
      r.getAs[String]("implementation_id") == "sysA_default_0" &&
        r.getAs[Int]("step_id") == 0).get
    // input cells concatenated in X order (X=1 -> "3", X=2 -> "7")
    assert(step0.getAs[String]("inputs") == "3,7")
    assert(step0.getAs[String]("operation") == "create")
    // output cells use the same ordered STRING_AGG (X=3 -> "10", X=4 -> "11")
    assert(step0.getAs[String]("output") == "10,11")
    assert(step0.getAs[Double]("execution_time_ms") == 2.0)
    assert(!step0.getAs[Boolean]("specified_oracle"))
    val step1 = obs.find(r =>
      r.getAs[String]("implementation_id") == "sysA_default_0" &&
        r.getAs[Int]("step_id") == 1).get
    assert(step1.getAs[String]("inputs") == null) // no input cells
    assert(step1.getAs[String]("output") == "[]")
  }

  test("implementation id: empty variant becomes 'default'") {
    val obs = ArenaIngest.observationsFromArena(Fixtures.rawArena, "DS")
    assert(obs.filter(obs("implementation_id") === "sysA_default_0")
      .count() == 2)
  }

  test("code dimension excludes oracle/abstraction and hashes source") {
    val code = ArenaIngest.codeFromArena(Fixtures.rawArena, "DS").collect()
    assert(code.length == 1)
    val r = code.head
    assert(r.getAs[String]("implementation_id") == "sysA_default_0")
    assert(r.getAs[String]("source_code") == "class A {}")
    assert(r.getAs[String]("code_hash").length == 64) // sha256 hex
    assert(r.getAs[Int]("lines_of_code") == 1)
  }

  test("fused regroup aggregate is bit-identical to the composed form") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // fixtures (multi-cell steps, oracle rows, metadata rows) ...
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.drop("created_at") // current_timestamp differs between runs
        .orderBy("implementation_id", "test_id", "run_id", "step_id")
        .collect().map(_.toSeq).toSeq
    assert(rows(ArenaIngest.observationsFromArena(Fixtures.rawArena, "DS"))
      == rows(ArenaIngest.observationsFromArenaComposed(
        Fixtures.rawArena, "DS")))
    // ... and a 4k-row synthesized export across many partitions (also
    // exercises the partial-merge serialize path via repartition)
    val spark2 = spark
    import spark2.implicits._
    val synth = (1 to 1000).flatMap { i =>
      Seq(
        (s"e${i % 3}", s"p${i % 5}", s"sys${i % 7}", "", "0",
          s"t${i % 11}", "a1", i % 4, i % 13, "input_value", s"in$i",
          i.toDouble),
        (s"e${i % 3}", s"p${i % 5}", s"sys${i % 7}", "", "0",
          s"t${i % 11}", "a1", i % 4 + 4, i % 13, "value", s"out$i",
          i.toDouble * 2),
        (s"e${i % 3}", s"p${i % 5}", s"sys${i % 7}", "", "0",
          s"t${i % 11}", "a1", 0, i % 13, "op", "invoke", i.toDouble),
        // a NULL VALUE cell: must be skipped by both forms
        (s"e${i % 3}", s"p${i % 5}", s"sys${i % 7}", "", "0",
          s"t${i % 11}", "a1", 9, i % 13, "value", null, i.toDouble))
    }.toDF("EXECUTIONID", "ABSTRACTIONID", "SYSTEMID", "VARIANTID",
      "ADAPTERID", "SHEETID", "ARENAID", "X", "Y", "TYPE", "VALUE",
      "EXECUTIONTIME").repartition(13)
    assert(rows(ArenaIngest.observationsFromArena(synth, "DS"))
      == rows(ArenaIngest.observationsFromArenaComposed(synth, "DS")))
    // sharded clustering (skew escape hatch): __shard is a pure function
    // of SHEETID, so the regroup output is identical — and the shard
    // column must not leak into the observation schema
    val sharded = ArenaIngest.observationsFromArena(
      ArenaIngest.clusterByProblem(synth, shards = 4), "DS")
    assert(!sharded.columns.contains("__shard"))
    assert(rows(sharded) ==
      rows(ArenaIngest.observationsFromArenaComposed(synth, "DS")))
  }

  test("sha1 ingest hashes are interchangeable with git hash-object") {
    // vectors from real `git hash-object --stdin` on the source content
    // (normalization is a no-op for these): the reference's dedup keys
    // are genuine git blob SHA-1s (arena.py:31-45), so sha1 = true makes
    // ingested hashes join an existing reference lakehouse
    val code = ArenaIngest.codeFromArena(Fixtures.rawArena, "DS",
      sha1 = true).collect().head
    assert(code.getAs[String]("source_code") == "class A {}")
    assert(code.getAs[String]("code_hash") ==
      "37bdd2221a71b58576da9d3c2dc0ef0998263652")
    val t = ArenaIngest.testsFromArena(Fixtures.rawArena, "DS",
      sha1 = true).collect().head
    assert(t.getAs[String]("source_code") == """{"cells":{"A1":"create"}}""")
    assert(t.getAs[String]("code_hash") ==
      "359bd20cee6ddc94126e32f6c2b880a7c59f7fcd")
    // default stays the DuckDB-checkable sha256
    assert(ArenaIngest.codeFromArena(Fixtures.rawArena, "DS")
      .collect().head.getAs[String]("code_hash").length == 64)
  }

  test("test ingest: grouped sheet source + focal interface, null dropped") {
    val tests = ArenaIngest.testsFromArena(Fixtures.rawArena, "DS").collect()
    // t2 has an interface row but no stimulussheet -> dropped
    // (arena.py:186-187 WHERE source_code IS NOT NULL)
    assert(tests.length == 1)
    val t = tests.head
    assert(t.getAs[String]("test_id") == "t1")
    assert(t.getAs[String]("source_code") == """{"cells":{"A1":"create"}}""")
    assert(t.getAs[String]("focal_interface") == "IFace")
    assert(t.getAs[String]("code_hash").length == 64)
    assert(t.getAs[String]("language") == "java")
    assert(t.getAs[String]("data_set_id") == "DS")
    assert(t.getAs[String]("problem_id") == "p1")
  }

  test("solr json code ingest: id suffix, lang, metrics") {
    val dir = tmpDir("solr")
    val json = """{"response":{"docs":[
      {"id":"impl-1","abstractionId":["p9"],"lang":"Java",
       "sourceCode":["class X {}"],"m_static_loc_td":[42],
       "m_static_complexity_td":[5]}]}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/export.json"), json)
    val code = ArenaIngest.codeFromSolrJson(spark, s"$dir/export.json", "DS")
      .collect()
    assert(code.length == 1)
    assert(code.head.getAs[String]("problem_id") == "p9")
    // {doc.id}_original_0 aligns with the {system}_{variant}_{adapter}
    // implementation_id convention (arena.py:291)
    assert(code.head.getAs[String]("implementation_id") ==
      "impl-1_original_0")
    assert(code.head.getAs[Int]("lines_of_code") == 42)
    assert(code.head.getAs[Int]("cyclomatic_complexity") == 5)
    assert(code.head.getAs[String]("language") == "java")
    assert(code.head.getAs[String]("source_code") == "class X {}")
  }

  test("solr json code ingest: 'content' field preferred, absent metrics null") {
    val dir = tmpDir("solr2")
    val json = """{"response":{"docs":[
      {"id":"impl-2","abstractionId":["p3"],"content":"class Y {}"}]}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/export.json"), json)
    val code = ArenaIngest.codeFromSolrJson(spark, s"$dir/export.json", "DS")
      .collect()
    assert(code.length == 1)
    assert(code.head.getAs[String]("source_code") == "class Y {}")
    assert(code.head.isNullAt(code.head.fieldIndex("lines_of_code")))
    assert(code.head.isNullAt(code.head.fieldIndex("language")))
  }
}
