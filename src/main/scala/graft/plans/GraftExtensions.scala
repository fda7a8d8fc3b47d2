package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions installer for the engine's native functions.
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *     ...
  *   spark.sql("SELECT graft_git_blob_hash(source_code) FROM code")
  *   spark.sql("""SELECT implementation_id,
  *     graft_trace_fingerprint(test_id, run_id, step_id, output) AS fp
  *     FROM observations GROUP BY implementation_id""")
  * }}}
  * Scalar expressions AND the native aggregates are injected — the
  * analyzer wraps an AggregateFunction returned by a builder in its
  * AggregateExpression, so the aggregates work in plain SQL GROUP BYs.
  * The reference's query surface needs no custom Strategy (SURVEY §4);
  * the one injected RULE is [[ResolveGraftTimeTravel]], which resolves
  * `VERSION AS OF` over snapshot-lite lakehouse tables (the Iceberg
  * SQL form) ahead of the built-in `ResolveRelations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Hints batch: runs BEFORE Resolution, where ResolveRelations
    // would hard-fail VERSION AS OF over the lakehouse temp views.
    ext.injectHintResolutionRule(session =>
      ResolveGraftTimeTravel(session))
    ext.injectFunction((GitBlobHashExpr.identifier, GitBlobHashExpr.info,
      GitBlobHashExpr.builder))
    ext.injectFunction((GitBlobHashExpr.sha1Identifier,
      GitBlobHashExpr.sha1Info, GitBlobHashExpr.sha1Builder))
    ext.injectFunction((VecDotExpr.identifier, VecDotExpr.info,
      VecDotExpr.builder))
    ext.injectFunction((CountInSetExpr.identifier, CountInSetExpr.info,
      CountInSetExpr.builder))
    ext.injectFunction((TraceFingerprintAgg.identifier,
      TraceFingerprintAgg.info, TraceFingerprintAgg.builder))
    ext.injectFunction((KeyedMinAgg.identifier, KeyedMinAgg.info,
      KeyedMinAgg.builder))
    ext.injectFunction((OrderedSigAgg.identifier, OrderedSigAgg.info,
      OrderedSigAgg.builder))
    ext.injectFunction((ZOrderExpr.identifier, ZOrderExpr.info,
      ZOrderExpr.builder))
    ext.injectFunction((TopKAgg.identifier, TopKAgg.info,
      TopKAgg.builder))
    ext.injectFunction((KmvAgg.identifier, KmvAgg.info,
      KmvAgg.builder))
  }
}
