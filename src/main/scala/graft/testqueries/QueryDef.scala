package graft.testqueries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame builder over the testdata
  * tables plus (where SQL-expressible) the equivalent DuckDB oracle SQL.
  * Every query ends in a total-order ORDER BY and aliases every computed
  * column identically on both sides (the driver sorts columns by name and
  * hash-compares values — SURVEY.md §5).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
