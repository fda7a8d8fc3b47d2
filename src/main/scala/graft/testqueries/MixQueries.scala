package graft.testqueries

import org.apache.spark.sql.functions._
import graft.ops.Mixing

/** Corpus mixture construction over the `documents` table
  * (ops/Mixing): target-composition sampling with deterministic
  * upsampling (epochs > 1), and the reproducible global shuffle order
  * a training run reads the mix in. Both decisions hash stable keys —
  * exactly replayable in the DuckDB oracle, and retry-stable on a
  * cluster (rand() is neither).
  */
object MixQueries {
  import Tables._

  /** Targets chosen so the driver's sf0.01 gate (25 docs/source)
    * exercises true upsampling — src0 runs 4 full epochs + a 20/25
    * fractional one — while larger SFs exercise the downsampling side
    * of the same arithmetic (fixed targets, growing pools). */
  private val targets = Map("src0" -> 120L, "src1" -> 40L, "src2" -> 10L)
  private val targetSql =
    "CASE p.source WHEN 'src0' THEN 120 WHEN 'src1' THEN 40 ELSE 10 END"

  private val mixSql =
    s"""WITH pool AS (
      SELECT doc_id, source FROM documents
      WHERE source IN ('src0', 'src1', 'src2')),
    counts AS (SELECT source, count(*) AS n FROM pool GROUP BY source),
    tgt AS (SELECT p.doc_id, p.source, c.n, $targetSql AS t
            FROM pool p JOIN counts c USING (source)),
    ex AS (SELECT doc_id, source, n, t, t // n AS copies, t % n AS rem,
             unnest(generate_series(0, t // n)) AS copy
           FROM tgt),
    mixed AS (SELECT doc_id, source, copy FROM ex
      WHERE copy < copies
         OR ('0x' || substr(md5('mix' || ':' || copy || ':'
              || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % n < rem)"""

  private def mixed(s: org.apache.spark.sql.SparkSession, d: String) =
    Mixing.mixCorpus(documents(s, d), "source", "doc_id", targets)

  def all: Seq[QueryDef] = Seq(

    // Mixture with exact integer rate arithmetic: expected output per
    // domain is exactly its target ((t div n) full epochs + a
    // hash-thresholded t-mod-n fractional epoch). One tiny broadcast
    // count join + a codegen'd explode — the corpus side never
    // shuffles; output order is a parallel range sort.
    QueryDef("q81_corpus_mix",
      (s, d) => QueryDef.sortedP(
        mixed(s, d).select(col("doc_id"), col("source"), col("copy")),
        col("doc_id"), col("copy")),
      Some(s"""$mixSql
        SELECT doc_id, source, copy FROM mixed
        ORDER BY doc_id, copy""")),

    // Training read order: a stable 60-bit position per (row, copy) —
    // replicas of an upsampled row scatter across the whole corpus
    // (their positions hash the copy number), and changing the salt
    // reshuffles every epoch reproducibly.
    QueryDef("q82_shuffle_order",
      (s, d) => QueryDef.sortedP(
        mixed(s, d)
          .withColumn("pos", Mixing.shufflePosition(
            concat_ws("#", col("doc_id"), col("copy")), "epoch0"))
          .select(col("pos"), col("doc_id"), col("copy")),
        col("pos"), col("doc_id"), col("copy")),
      Some(s"""$mixSql
        SELECT ('0x' || substr(md5('epoch0' || ':' || doc_id || '#'
            || copy), 1, 15))::BIGINT AS pos, doc_id, copy
        FROM mixed
        ORDER BY pos, doc_id, copy""")))
}
