package graft

/** Every declared query must run at every driver scale factor — sf0.001
  * is the driver's t1 smoke scale; a query that implicitly assumes
  * sf0.01 cardinalities (ids, labels, value ranges) breaks here first.
  */
class CatalogSmokeSpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = graft.testqueries.Registry.all.flatMap { q =>
      try { q.run(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable =>
        Some(q.name + ": " + e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL exists for every query and mentions its tables") {
    val oracles = SparkEntry.oracleSql
    // Rows-only queries (driver contract: "omit for non-SQL-expressible
    // ops") must be EXPLICITLY justified here — everything else needs a
    // full oracle, so a forgotten `None` cannot silently weaken a gate.
    // Empty since round 7: q90 (the last holdout) gained a chained-CTE
    // oracle — fixed-k iteration IS single-statement-expressible.
    val rowsOnly = Set.empty[String]
    assert(
      oracles.size + rowsOnly.size == graft.testqueries.Registry.all.size)
    assert(rowsOnly.forall(n => !oracles.contains(n)),
      "rows-only allowlist names a query that HAS an oracle")
    // single-row global aggregates need no ORDER BY
    val singleRow = Set("q11_two_level_agg", "q101_triangle_count")
    oracles.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("SELECT"), name)
      assert(singleRow(name) || sql.toUpperCase.contains("ORDER BY"),
        s"$name lacks ORDER BY")
    }
  }
}
