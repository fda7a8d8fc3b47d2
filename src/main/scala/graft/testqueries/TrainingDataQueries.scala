package graft.testqueries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** Training-data pipeline operators, batch 2 — exact substring dedup
  * (Lee et al. 2022), CCNet-style unigram LM quality scoring, BM25
  * retrieval ranking, and per-row weighted sampling. All over the
  * `documents` table; every FP step follows the round-6dp +
  * exact-decimal-sum discipline so the DuckDB mirrors replay
  * bit-for-bit.
  */
object TrainingDataQueries {
  import Tables._

  /** Span length for q83. 5-word spans make chance cross-document
    * collisions rare on the synthetic vocabulary (~40 words: 40^5
    * possible spans vs ~60k span instances at sf0.01) while the
    * ScaleUp-replicated corpora (verbatim copies under fresh doc_ids)
    * exercise the everything-is-duplicated extreme of the same code. */
  private val SpanN = 5

  def all: Seq[QueryDef] = Seq(

    // Exact duplicated-substring removal: word positions covered by a
    // 5-gram span occurring in >= 2 distinct documents are dropped and
    // the survivors rejoined in order. The DuckDB mirror reproduces
    // coverage with a windowed MAX over flagged span starts (ROWS n-1
    // PRECEDING), which is the same [s, s+n-1] interval algebra as the
    // Spark side's per-position exists() over the start list.
    QueryDef("q83_dup_span_removal",
      // sortedPMat, not sortedP: the pipeline joins dup-span starts
      // back to the corpus, and a bare range exchange would sample
      // (and re-execute) that join — the q53/q39 trap PlanShapeSpec
      // guards against.
      (s, d) => QueryDef.sortedPMat(
        TextAnalysis.removeDupSpans(documents(s, d), "doc_id", "text",
            SpanN, 2)
          .select(col("doc_id"), col("n_removed"), col("clean_text")),
        col("doc_id")),
      Some(s"""WITH base AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents),
        w AS (
          SELECT doc_id, i::BIGINT AS pos, ws[i] AS w
          FROM base, LATERAL unnest(generate_series(1, len(ws))) AS t(i)),
        g AS (
          SELECT doc_id, pos,
            array_to_string(ws[pos:pos + ${SpanN - 1}], ' ') AS s
          FROM base,
            LATERAL unnest(generate_series(1, len(ws))) AS t(pos)
          WHERE pos <= len(ws) - ${SpanN - 1}),
        dup AS (
          SELECT s FROM g GROUP BY s
          HAVING COUNT(DISTINCT doc_id) >= 2),
        f AS (
          SELECT w.doc_id, w.pos, w.w,
            CASE WHEN d2.pos IS NOT NULL THEN 1 ELSE 0 END AS flag
          FROM w LEFT JOIN
            (SELECT g.doc_id, g.pos FROM g JOIN dup USING (s)) d2
            ON w.doc_id = d2.doc_id AND w.pos = d2.pos),
        c AS (
          SELECT doc_id, pos, w,
            MAX(flag) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN ${SpanN - 1} PRECEDING AND CURRENT ROW) AS cov
          FROM f)
        SELECT doc_id, SUM(cov)::BIGINT AS n_removed,
          string_agg(w, ' ' ORDER BY pos) FILTER (WHERE cov = 0)
            AS clean_text
        FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // Unigram LM quality score: per-document mean negative natural
    // log-probability under the corpus's own unigram model. The only
    // libm call (ln) is rounded to 6 dp per word TYPE; document totals
    // are exact decimal sums, so cross-engine summation order cannot
    // move the result.
    QueryDef("q84_unigram_lm_score",
      // sortedPMat: the word stream joins the probability table below
      // the output sort — materialize once, then range-sort.
      (s, d) => QueryDef.sortedPMat(
        TextAnalysis.unigramLmScore(documents(s, d), "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_words"), col("lm_nll")),
        col("doc_id")),
      Some("""WITH w AS (
          SELECT doc_id,
            unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents),
        c AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
        t AS (SELECT SUM(cnt)::DOUBLE AS tot FROM c),
        p AS (SELECT w,
            ROUND(-ln(cnt::DOUBLE / tot), 6)::DECIMAL(28,6) AS nll
          FROM c, t)
        SELECT doc_id, COUNT(*) AS n_words,
          SUM(nll)::DOUBLE / COUNT(*) AS lm_nll
        FROM w JOIN p USING (w)
        GROUP BY doc_id ORDER BY doc_id""")),

    // BM25 top-20 for a 3-term query. Derived FP constants (k1+1, 1-b)
    // are computed once in TextAnalysis.bm25Rank and interpolated here
    // via Double.toString round-tripping, so both engines multiply by
    // bit-identical values; ln is rounded per term, partial scores per
    // (doc, term), totals are exact decimal sums.
    QueryDef("q85_bm25_topk", {
      val terms = Seq("spark", "join", "window")
      (s, d) => TextAnalysis.bm25Rank(documents(s, d), "doc_id", "text",
          terms)
        .select(col("id").as("doc_id"), col("bm25"))
    },
      Some(s"""WITH base AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents),
        l AS (SELECT doc_id, len(ws)::BIGINT AS len FROM base),
        stats AS (SELECT COUNT(*)::BIGINT AS nn,
          SUM(len)::DOUBLE AS sumlen FROM l),
        w AS (SELECT doc_id, unnest(ws) AS w FROM base),
        tf AS (SELECT w.doc_id, l.len, w.w, COUNT(*)::BIGINT AS tf
          FROM w JOIN l USING (doc_id)
          WHERE w.w IN ('spark', 'join', 'window')
          GROUP BY w.doc_id, l.len, w.w),
        dft AS (SELECT w, COUNT(*)::BIGINT AS df FROM tf GROUP BY w),
        s AS (SELECT tf.doc_id,
            ROUND(
              ROUND(ln((stats.nn - dft.df + 0.5) / (dft.df + 0.5) + 1.0),
                6)
              * ((tf.tf * ${1.2 + 1.0}) /
                 (tf.tf + ${1.2} * (${1.0 - 0.75} +
                   (${0.75} * tf.len) / (stats.sumlen / stats.nn)))),
              6)::DECIMAL(28,6) AS st
          FROM tf, dft, stats WHERE tf.w = dft.w)
        SELECT doc_id, SUM(st)::DOUBLE AS bm25
        FROM s GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20""")),

    // Per-row weighted sample: keep probability proportional to
    // document length (2 permille per char, capped at 999), decided by
    // integer hash arithmetic — no FP thresholds anywhere.
    QueryDef("q86_weighted_sample",
      (s, d) => QueryDef.sortedP(
        Sampling.weightedSample(documents(s, d), col("doc_id"),
            least(lit(999L), col("n_chars") * 2), "w86")
          .select(col("doc_id"), col("n_chars")),
        col("doc_id")),
      Some("""SELECT doc_id, n_chars FROM documents
        WHERE ('0x' || substr(md5('w86:' || CAST(doc_id AS VARCHAR)),
            1, 15))::BIGINT % 1000
          < least(999, n_chars * 2)
        ORDER BY doc_id""")),

    // Curation keep/drop decisions CONSUMING q97's content_free flag:
    // every doc gets keep / drop_dup / drop_content_free (symbol-only
    // classes are dropped whole — no survivor), rolled up per source.
    // One agg shuffle + one join back on the SAME key (content_hash);
    // the canonical-text definition is shared with q97 verbatim.
    QueryDef("q111_curation_decisions",
      (s, d) => QueryDef.sortedP(
        Dedup.curate(documents(s, d), "doc_id", "text")
          .groupBy(col("source"), col("decision"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars")),
        col("source"), col("decision")),
      Some("""WITH c AS (SELECT doc_id, source, n_chars,
          md5(trim(regexp_replace(
            regexp_replace(
              regexp_replace(lower(text),
                '[\p{Zs}\x{2028}\x{2029}\x{0085}]', ' ', 'g'),
              '[^\p{L}\p{N}\s]', '', 'g'),
            '\s+', ' ', 'g'))) AS content_hash
        FROM documents),
        cls AS (SELECT content_hash, MIN(doc_id) AS keep_id,
            content_hash = md5('') AS content_free
          FROM c GROUP BY content_hash)
        SELECT source,
          CASE WHEN content_free THEN 'drop_content_free'
               WHEN doc_id = keep_id THEN 'keep'
               ELSE 'drop_dup' END AS decision,
          COUNT(*)::BIGINT AS n_docs, SUM(n_chars)::BIGINT AS chars
        FROM c JOIN cls USING (content_hash)
        GROUP BY source, decision ORDER BY source, decision""")))
}
