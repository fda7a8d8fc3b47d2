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

object QueryDef {
  /** Total-order sort for small-to-medium results of expensive pipelines:
    * shuffle everything to one partition, sort there. Identical row order
    * to orderBy(cols) but executes the upstream pipeline ONCE — a global
    * orderBy runs it twice (RangePartitioner samples the child first).
    * Keep plain orderBy for large outputs of cheap pipelines. */
  def sorted1(df: DataFrame,
      cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Filter WITHOUT letting the predicate push below this point. A filter
    * on an expensive projected column (e.g. a 64-term dot product) would
    * otherwise be substituted into the join condition below and the
    * expression evaluated per candidate pair — twice. The temporary
    * nondeterministic column blocks PushDownPredicates (which requires a
    * fully-deterministic project list); values are unaffected. */
  def filterAbove(df: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__barrier",
        org.apache.spark.sql.functions.monotonically_increasing_id())
      .filter(cond)
      .drop("__barrier")
}
