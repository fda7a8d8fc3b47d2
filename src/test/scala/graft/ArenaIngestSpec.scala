package graft

import graft.ingest.ArenaIngest

class ArenaIngestSpec extends SparkSpec {

  test("observation regroup: ordered inputs, conditional extraction") {
    val obs = ArenaIngest.observationsFromArena(Fixtures.rawArena, "DS")
      .orderBy("implementation_id", "step_id")
      .collect()
    // sysA step 0 + step 1, oracle step 0
    assert(obs.length == 3)
    val step0 = obs.find(r =>
      r.getAs[String]("implementation_id") == "sysA_default_0" &&
        r.getAs[Int]("step_id") == 0).get
    // input cells concatenated in X order (X=1 -> "3", X=2 -> "7")
    assert(step0.getAs[String]("inputs") == "3,7")
    assert(step0.getAs[String]("operation") == "create")
    assert(step0.getAs[String]("output") == "10")
    assert(step0.getAs[Double]("execution_time_ms") == 2.0)
    assert(!step0.getAs[Boolean]("specified_oracle"))
    val step1 = obs.find(r =>
      r.getAs[String]("implementation_id") == "sysA_default_0" &&
        r.getAs[Int]("step_id") == 1).get
    assert(step1.getAs[String]("inputs") == null) // no input cells
    assert(step1.getAs[String]("output") == "[]")
    val oracle = obs.find(r =>
      r.getAs[String]("implementation_id").startsWith("oracle")).get
    assert(oracle.getAs[Boolean]("specified_oracle"))
  }

  test("implementation id: empty variant becomes 'default'") {
    val obs = ArenaIngest.observationsFromArena(Fixtures.rawArena, "DS")
    assert(obs.filter(obs("implementation_id") === "sysA_default_0")
      .count() == 2)
  }

  test("code dimension excludes oracle and hashes source") {
    val code = ArenaIngest.codeFromArena(Fixtures.rawArena, "DS").collect()
    assert(code.length == 1)
    val r = code.head
    assert(r.getAs[String]("implementation_id") == "sysA_default_0")
    assert(r.getAs[String]("source_code") == "class A {}")
    assert(r.getAs[String]("code_hash").length == 64) // sha256 hex
    assert(r.getAs[Int]("lines_of_code") == 1)
  }

  test("solr json code ingest") {
    val dir = tmpDir("solr")
    val json = """{"response":{"docs":[
      {"id":"impl-1","abstractionId":["p9"],
       "sourceCode":["class X {}"],"m_static_loc_td":[42]}]}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/export.json"), json)
    val code = ArenaIngest.codeFromSolrJson(spark, s"$dir/export.json", "DS")
      .collect()
    assert(code.length == 1)
    assert(code.head.getAs[String]("problem_id") == "p9")
    assert(code.head.getAs[Int]("lines_of_code") == 42)
    assert(code.head.getAs[String]("source_code") == "class X {}")
  }
}
