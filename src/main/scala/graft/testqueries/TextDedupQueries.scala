package graft.testqueries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.Fns

/** Training-data-pipeline operators over the `documents` table: content
  * hashing, exact dedup, quality scoring, language ID, tokenization,
  * fingerprinting, MinHash/LSH and n-gram Jaccard near-dup. Every stage is
  * built from codegen'd built-ins and carries an exact DuckDB oracle.
  *
  * Scale notes (100 TB): all shapes are shuffle-by-key — shingle explode →
  * (doc, shingle) distinct → band-bucket join. No driver-side loops, no
  * pairwise n² except inside LSH/blocking buckets.
  */
object TextDedupQueries {
  import Tables._

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopSqlList = stop.map(s => s"'$s'").mkString(", ")

  private val shingleSql =
    """sh AS (
      SELECT DISTINCT doc_id,
        ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
            FROM documents),
        UNNEST(range(1, len(ws) - 1)) t(i))"""

  /** 16-member MinHash signatures via graft.ops.Dedup (single-pass wide
    * aggregation — no ×16 row explode). */
  private def minhash(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.ops.Dedup.minhashSig(documents(s, d), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")

  private val minhashSql = {
    // the same universal-hash family constants as Fns.hashA/hashB
    val fam = (0 until 16).map(j =>
      s"(${j}, ${Fns.hashA(j)}, ${Fns.hashB(j)})").mkString(", ")
    s"""$shingleSql,
      hb AS (
        SELECT doc_id,
          ('0x' || substr(md5(s), 1, 15))::BIGINT % ${Fns.HashP} AS h
        FROM sh),
      mh AS (
        SELECT doc_id, j, min((a * h + b) % ${Fns.HashP}) AS mh
        FROM hb, (VALUES $fam) t(j, a, b)
        GROUP BY doc_id, j)"""
  }

  val all: Seq[QueryDef] = Seq(

    // X7: git-blob-style content hash — normalize (CRLF→LF, strip
    // trailing ws / blank lines) then hash "blob <bytelen> <body>"
    // (reference arena.py:11-45; sha256 for DuckDB parity, see Fns).
    QueryDef("q15_git_blob_hash",
      (s, d) => documents(s, d)
        .select(col("doc_id"), Fns.gitBlobHash(col("text")).as("code_hash"))
        .orderBy("doc_id"),
      Some("""WITH n AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(
            regexp_replace(text, '\r\n?', chr(10), 'g'),
            '(?m)[ \t\x0b\f\x{1c}-\x{1f}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+$',
            '', 'g'), '\n+$', '') AS t
        FROM documents)
      SELECT doc_id,
        sha256('blob ' || CAST(strlen(t) AS VARCHAR) || chr(0) || t)
          AS code_hash
      FROM n ORDER BY doc_id""")),

    // Exact dedup: hash-groupBy on content digest, keep-first policy
    // (min doc_id). One shuffle on a fixed-width key.
    QueryDef("q16_dedup_exact",
      (s, d) => documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("copies"))
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        COUNT(*) AS copies
      FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // Quality scoring: word/char/punct/stopword stats + a deterministic
    // composite score. Pure per-row expressions — fully codegen'd scan.
    QueryDef("q17_text_quality",
      (s, d) => {
        val ws = Fns.words(col("text"))
        val nWords = size(ws)
        // native set-membership count (CountInSetExpr): same value as
        // size(filter(ws, isin)), one codegen'd loop
        val nStop = graft.plans.CountInSetExpr.countInSet(ws, stop)
        val nPunct = regexp_count(col("text"),
          lit("[^A-Za-z0-9\\s]"))
        val nonSpace = length(regexp_replace(col("text"), "\\s+", ""))
        // per-document output scales with the corpus: range-partition the
        // raw docs on the sort key (the per-row projection preserves it)
        // and finish with a parallel sortWithinPartitions
        documents(s, d).repartitionByRange(col("doc_id")).select(
          col("doc_id"),
          nWords.as("n_words"),
          nStop.as("n_stop"),
          nPunct.as("n_punct"),
          (nonSpace / nWords).as("avg_word_len"),
          (nStop / nWords).as("stop_ratio"),
          ((nStop / nWords) * 0.5 +
            when(nWords >= 20, 0.5).otherwise(nWords * 0.025))
            .as("quality_score"))
          .sortWithinPartitions("doc_id")
      },
      Some(s"""SELECT doc_id,
        len(string_split_regex(trim(text), '\\s+')) AS n_words,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
          w -> w IN ($stopSqlList))) AS n_stop,
        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
        length(regexp_replace(text, '\\s+', '', 'g')) /
          len(string_split_regex(trim(text), '\\s+')) AS avg_word_len,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
          w -> w IN ($stopSqlList))) /
          len(string_split_regex(trim(text), '\\s+')) AS stop_ratio,
        (len(list_filter(string_split_regex(trim(text), '\\s+'),
          w -> w IN ($stopSqlList))) /
          len(string_split_regex(trim(text), '\\s+')))
            * CAST(0.5 AS DOUBLE) +
          (CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 20
            THEN CAST(0.5 AS DOUBLE)
            ELSE len(string_split_regex(trim(text), '\\s+'))
              * CAST(0.025 AS DOUBLE) END)
          AS quality_score
      FROM documents ORDER BY doc_id""")),

    // Language ID: stopword-hit scores per language + CJK char count,
    // argmax with a fixed tie order (n-gram-heuristic family).
    QueryDef("q18_lang_id",
      (s, d) => {
        val ws = Fns.words(lower(col("text")))
        def hits(l: Seq[String]): Column =
          graft.plans.CountInSetExpr.countInSet(ws, l)
        val sEn = hits(Seq("the", "a", "of", "and", "is"))
        val sDe = hits(Seq("der", "die", "das", "und", "ist"))
        val sEs = hits(Seq("el", "la", "de", "y", "es"))
        val sFr = hits(Seq("le", "la", "les", "et", "est"))
        val sZh = regexp_count(col("text"),
          lit("[一-鿿]"))
        // per-document output: range-partition raw docs (see q17)
        documents(s, d).repartitionByRange(col("doc_id"))
          .select(col("doc_id"), col("lang").as("actual_lang"),
          sEn.as("s_en"), sDe.as("s_de"), sEs.as("s_es"), sFr.as("s_fr"),
          sZh.as("s_zh"),
          when(sZh > 0, "zh")
            .when(sEn >= sDe && sEn >= sEs && sEn >= sFr, "en")
            .when(sDe >= sEs && sDe >= sFr, "de")
            .when(sEs >= sFr, "es")
            .otherwise("fr").as("predicted_lang"))
          .sortWithinPartitions("doc_id")
      },
      Some {
        def hitsSql(l: Seq[String]) =
          "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), " +
            s"w -> w IN (${l.map(x => s"'$x'").mkString(", ")})))"
        val en = hitsSql(Seq("the", "a", "of", "and", "is"))
        val de = hitsSql(Seq("der", "die", "das", "und", "ist"))
        val es = hitsSql(Seq("el", "la", "de", "y", "es"))
        val fr = hitsSql(Seq("le", "la", "les", "et", "est"))
        val zh = "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
        s"""SELECT doc_id, lang AS actual_lang,
          $en AS s_en, $de AS s_de, $es AS s_es, $fr AS s_fr, $zh AS s_zh,
          CASE WHEN $zh > 0 THEN 'zh'
               WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
               WHEN $de >= $es AND $de >= $fr THEN 'de'
               WHEN $es >= $fr THEN 'es'
               ELSE 'fr' END AS predicted_lang
        FROM documents ORDER BY doc_id"""
      }),

    // Token counting: whitespace words + BPE-ish regex tokens
    // (letter-runs | digit-runs | single symbol).
    QueryDef("q19_token_count",
      (s, d) => documents(s, d).select(
        col("doc_id"),
        size(Fns.words(col("text"))).as("ws_tokens"),
        regexp_count(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("bpe_tokens"),
        length(col("text")).as("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
          AS bpe_tokens,
        length(text) AS n_chars
      FROM documents ORDER BY doc_id""")),

    // Document fingerprinting: polynomial rolling hash (base 31, mod
    // 1e9+7) over the first 64 chars — an ordered left fold in both
    // engines, exact int64 arithmetic.
    QueryDef("q20_rolling_hash",
      (s, d) => documents(s, d).select(
        col("doc_id"),
        aggregate(
          transform(split(substring(col("text"), 1, 64), ""), c => ascii(c)),
          lit(0L),
          (acc, c) => (acc * 31 + c) % 1000000007L).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(substr(text, 1, 64), ''),
              c -> CAST(ord(c) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
      FROM documents ORDER BY doc_id""")),

    // MinHash signatures (16 hash-family members over word-3-gram
    // shingles) — the portable 60-bit hash makes the signature itself
    // engine-checkable.
    QueryDef("q21_minhash_signatures",
      // per-document output: parallel range sort in tail position (the
      // shingle distinct inside minhashSig repartitions by (doc, shingle),
      // so there is no partitioning to preserve from the source)
      (s, d) => minhash(s, d)
        .select(col("doc_id"), array_join(col("sig"), ",").as("sig"))
        .transform(QueryDef.sortedP(_, col("doc_id"))),
      Some(s"""WITH $minhashSql
      SELECT doc_id,
        string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
      FROM mh GROUP BY doc_id ORDER BY doc_id""")),

    // MinHash-LSH candidate pairs: 4 bands × 4 rows, band-hash bucket
    // join, estimated similarity = matching-minhash fraction. The join
    // is on (band index, band hash) — at 100 TB this is the standard
    // near-dup shuffle; no global n².
    QueryDef("q22_minhash_lsh_candidates",
      (s, d) => graft.ops.Dedup
        .minhashLsh(documents(s, d), "doc_id", "text")
        .transform(QueryDef.sorted1(_, col("a_id"), col("b_id"))),
      Some(s"""WITH $minhashSql,
      sig AS (
        SELECT doc_id, list(CAST(mh AS VARCHAR) ORDER BY j) AS sig
        FROM mh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, b,
          md5(sig[b*4+1] || ',' || sig[b*4+2] || ',' || sig[b*4+3] || ','
            || sig[b*4+4]) AS bh
        FROM sig, UNNEST(range(0, 4)) t(b)),
      cand AS (
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
      SELECT c.a_id, c.b_id,
        CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS DOUBLE)
          / 16.0 AS est_sim
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.a_id
      JOIN mh mb ON mb.doc_id = c.b_id AND ma.j = mb.j
      GROUP BY c.a_id, c.b_id ORDER BY a_id, b_id""")),

    // Per-doc LSH candidate COUNT — q22's aggregate consumer (the
    // q39->q76 discipline applied to dedup): the pair list grows with
    // duplication² (measured 9.4x for 3.3x data at sf10) but the count
    // needs only distinct-signature group sizes + matched-partner
    // sums; rows out = docs, never pairs. The oracle counts distinct
    // partners from the enumerated doc-level pair list — affordable at
    // oracle scale, which is exactly the point of the split.
    QueryDef("q109_lsh_candidate_counts",
      (s, d) => QueryDef.sortedP(
        graft.ops.Dedup
          .minhashLshCandidateCounts(documents(s, d), "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_candidates")),
        col("doc_id")),
      Some(s"""WITH $minhashSql,
      sig AS (
        SELECT doc_id, list(CAST(mh AS VARCHAR) ORDER BY j) AS sig
        FROM mh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, b,
          md5(sig[b*4+1] || ',' || sig[b*4+2] || ',' || sig[b*4+3] || ','
            || sig[b*4+4]) AS bh
        FROM sig, UNNEST(range(0, 4)) t(b)),
      cand AS (
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
      parts AS (
        SELECT a_id AS id, b_id AS p FROM cand
        UNION ALL SELECT b_id, a_id FROM cand),
      cnt AS (
        SELECT id, COUNT(DISTINCT p) AS n FROM parts GROUP BY id)
      SELECT s.doc_id,
        CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_candidates
      FROM sig s LEFT JOIN cnt ON s.doc_id = cnt.id
      ORDER BY doc_id""")),

    // Exact n-gram Jaccard near-dup: shared-shingle candidate join,
    // |A∩B| / (|A|+|B|−|A∩B|), threshold 0.3.
    // The declared path exercises the df-capped join (maxDf = 50): the
    // cap is the operator's scale story — an ultra-common shingle would
    // otherwise contribute df² candidate pairs — so the oracle-checked
    // query is the capped one, with the identical df filter in DuckDB.
    // Threshold and df-cap are GateKnobs (defaults 0.3 / 50, which
    // reproduce the un-knobbed query bit-for-bit): at sf10 the
    // replication factor pushes every shared shingle's df past a
    // fixed cap AND dilutes Jaccard below a fixed threshold, so the
    // un-knobbed sf10 gate row was vacuously green (0 rows on both
    // engines). Gate scripts scale both knobs there; the values are
    // interpolated into Spark AND oracle from ONE definition.
    QueryDef("q23_ngram_jaccard",
      (s, d) => graft.ops.Dedup
        .ngramJaccard(documents(s, d), "doc_id", "text",
          GateKnobs.jaccardThreshold, maxDf = GateKnobs.jaccardMaxDf)
        .transform(QueryDef.sorted1(_, col("a_id"), col("b_id"))),
      Some(s"""WITH $shingleSql,
      shc AS (SELECT doc_id, s FROM sh
        QUALIFY COUNT(*) OVER (PARTITION BY s)
          <= ${GateKnobs.jaccardMaxDf}),
      sz AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
      inter AS (
        SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      SELECT a_id, b_id, inter,
        inter / (sa.sz + sb.sz - inter) AS jaccard
      FROM inter
      JOIN sz sa ON a_id = sa.doc_id
      JOIN sz sb ON b_id = sb.doc_id
      WHERE inter / (sa.sz + sb.sz - inter)
        >= ${GateKnobs.jaccardThreshold}
      ORDER BY a_id, b_id""")),

    // SimHash: 32-bit signature — per-word 60-bit hash, per-bit ±1 vote,
    // sign-of-sum sets the bit. 32 conditional sums in one aggregation
    // pass (no per-bit explode).
    QueryDef("q24_simhash",
      (s, d) => {
        val bits = 0 until 32
        val votes = bits.map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
            .otherwise(-1)).as(s"v$b"))
        // range-partition raw docs by the sort key: the explode
        // (Generate) preserves it, the per-doc vote aggregation runs
        // exchange-free on it, and the total order comes out parallel —
        // one range exchange total, no single-task sort
        val voted = documents(s, d)
          .repartitionByRange(col("doc_id"))
          .select(col("doc_id"),
            explode(Fns.words(col("text"))).as("w"))
          .withColumn("h", Fns.portableHash60(col("w")))
          .groupBy("doc_id")
          .agg(votes.head, votes.tail: _*)
        voted.select(col("doc_id"),
          bits.map(b => when(col(s"v$b") > 0, shiftleft(lit(1L), b))
            .otherwise(0L)).reduce(_ + _).as("simhash"))
          .sortWithinPartitions("doc_id")
      },
      Some {
        val votes = (0 until 32).map(b =>
          s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
          .mkString(", ")
        val combine = (0 until 32).map(b =>
          s"(CASE WHEN v$b > 0 THEN (CAST(1 AS BIGINT) << $b) " +
            "ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
        s"""WITH w AS (
          SELECT doc_id,
            unnest(string_split_regex(trim(text), '\\s+')) AS w
          FROM documents),
        h AS (SELECT doc_id,
          ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM w),
        v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
        SELECT doc_id, $combine AS simhash FROM v ORDER BY doc_id"""
      }),

    // End-to-end curation pipeline (TextAnalysis.curate): quality gate →
    // language ID → exact dedup keep-first — the composed pretraining
    // corpus filter, oracle-verified through the library operator itself.
    QueryDef("q53_curation",
      // kept-corpus output scales with the input: parallel range sort in
      // tail position (curate's dedup stage shuffles by content digest,
      // so no source partitioning survives to reuse); materialized once
      // (sortedPMat) so the range sampler doesn't replay the
      // regex-heavy scoring scan — measured 1.6s -> ~0.9s
      (s, d) => graft.ops.TextAnalysis
        .curate(documents(s, d), "doc_id", "text",
          minWords = 10, minQuality = 0.3)
        .select(col("doc_id"), col("predicted_lang"), col("n_words"),
          col("quality_score"))
        .transform(QueryDef.sortedPMat(_, col("doc_id"))),
      Some {
        // mirrors TextAnalysis exactly: 5-word stopword lists, unlowered
        // words for quality, lowered for language ID, argmax tie order
        def hitsSql(e: String, l: Seq[String]) =
          s"len(list_filter(string_split_regex(trim($e), '\\s+'), " +
            s"w -> w IN (${l.map(x => s"'$x'").mkString(", ")})))"
        val nStop = hitsSql("text", Seq("the", "a", "of", "and", "is"))
        val en = hitsSql("lower(text)", Seq("the", "a", "of", "and", "is"))
        val de = hitsSql("lower(text)",
          Seq("der", "die", "das", "und", "ist"))
        val es = hitsSql("lower(text)", Seq("el", "la", "de", "y", "es"))
        val fr = hitsSql("lower(text)", Seq("le", "la", "les", "et", "est"))
        val zh = "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
        s"""WITH q AS (
          SELECT doc_id, text,
            len(string_split_regex(trim(text), '\\s+')) AS n_words,
            ($nStop / len(string_split_regex(trim(text), '\\s+')))
              * CAST(0.5 AS DOUBLE) +
              CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 20
                THEN CAST(0.5 AS DOUBLE)
                ELSE len(string_split_regex(trim(text), '\\s+'))
                  * CAST(0.025 AS DOUBLE)
              END AS quality_score
          FROM documents),
        gated AS (
          SELECT * FROM q WHERE n_words >= 10 AND quality_score >= 0.3),
        keep AS (
          SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text))
        SELECT g.doc_id,
          CASE WHEN $zh > 0 THEN 'zh'
            WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
            WHEN $de >= $es AND $de >= $fr THEN 'de'
            WHEN $es >= $fr THEN 'es'
            ELSE 'fr' END AS predicted_lang,
          n_words, quality_score
        FROM gated g JOIN keep USING (doc_id)
        ORDER BY doc_id"""
      }),

    // Gopher-rule repetition signals (Rae et al. 2021 §A1.1): fraction
    // of repeated non-empty lines / repeated words per document — the
    // boilerplate/spam filters of a pretraining pipeline. Pure per-row
    // array expressions, zero shuffles.
    QueryDef("q60_repetition_signals",
      (s, d) => graft.ops.TextAnalysis
        .repetitionSignals(documents(s, d), "text")
        .select(col("doc_id"), col("dup_line_frac"), col("dup_word_frac"))
        .orderBy("doc_id"),
      Some("""WITH w AS (
        SELECT doc_id,
          list_filter(string_split(text, chr(10)),
            l -> len(l) > 0) AS lines,
          CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
            ELSE string_split_regex(trim(text), '\s+') END AS ws
        FROM documents)
      SELECT doc_id,
        CASE WHEN len(lines) > 0
          THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
            / len(lines)
          ELSE CAST(0.0 AS DOUBLE) END AS dup_line_frac,
        CASE WHEN len(ws) > 0
          THEN CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
          ELSE CAST(0.0 AS DOUBLE) END AS dup_word_frac
      FROM w ORDER BY doc_id""")),

    // PII redaction (emails / IPv4 / international phone numbers →
    // typed tags) — the masking pass before tokenization. The patterns
    // are lookaround-free so Java regex and RE2 execute them
    // identically; the DuckDB oracle replays the chain verbatim.
    QueryDef("q61_pii_redaction",
      (s, d) => graft.ops.TextAnalysis
        .redactPii(documents(s, d), "text")
        .select(col("doc_id"), col("redacted"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
          'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
          '\+\d{7,15}', '<PHONE>', 'g') AS redacted
      FROM documents ORDER BY doc_id""")),

    // Sequence chunking (TextAnalysis.chunkTokens): token stream →
    // fixed-size training-context windows with overlap carry-over
    // (6-token chunks, 2-token overlap here). Pure per-row explode, no
    // shuffle; the final short chunk is kept, empty docs yield none.
    QueryDef("q62_sequence_chunking",
      (s, d) => graft.ops.TextAnalysis
        .chunkTokens(documents(s, d), "text", chunkSize = 6, overlap = 2)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          array_join(col("chunk_tokens"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (
        SELECT doc_id,
          regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')
            AS toks
        FROM documents)
      SELECT doc_id, CAST(i // 4 AS INTEGER) AS chunk_idx,
        CAST(len(list_slice(toks, i + 1, i + 6)) AS INTEGER) AS n_tokens,
        array_to_string(list_slice(toks, i + 1, i + 6), ' ')
          AS chunk_text
      FROM t, UNNEST(range(0, CAST(len(toks) AS BIGINT), 4)) AS u(i)
      ORDER BY doc_id, chunk_idx""")),

    // Deterministic stratified sampling (ops/Sampling): per-language
    // keep fractions decided by a portable key hash — stable under task
    // retries (rand() is not) and exactly replayable in the oracle.
    // The pretraining-mix rebalancing step: downsample the dominant
    // language, keep the tail whole.
    QueryDef("q63_stratified_sample",
      (s, d) => graft.ops.Sampling.stratifiedSample(
          documents(s, d), col("lang"), col("doc_id"),
          Map("en" -> 0.25, "de" -> 0.5))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000
        < CASE WHEN lang = 'en' THEN 250000
            WHEN lang = 'de' THEN 500000
            ELSE 1000000 END
      ORDER BY doc_id""")),

    // Near-dup group collapse under the oracle gate: the q22 LSH
    // candidate pairs → connected components (Dedup.nearDupGroups'
    // min-label fixpoint) → per-document group id + keep-first flag.
    // The DuckDB mirror reaches the same fixpoint with a recursive CTE:
    // on an undirected edge list, the set of ids reachable from a node
    // is its component, so MIN(reachable id) = the component's min
    // label — exactly what the iterative propagation converges to.
    QueryDef("q65_neardup_groups",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = graft.ops.Dedup.minhashLsh(docs, "doc_id", "text")
        val groups = graft.ops.Dedup
          .nearDupGroups(pairs, "a_id", "b_id")
          .withColumnRenamed("id", "doc_id")
        // corpus-proportional output: parallel range sort (sortedP)
        docs.select(col("doc_id"))
          .join(groups, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("group_id"), col("doc_id")).as("group_id"),
            when(coalesce(col("group_id"), col("doc_id"))
              === col("doc_id"), 1).otherwise(0).as("kept"))
          .transform(QueryDef.sortedP(_, col("doc_id")))
      },
      Some(s"""WITH RECURSIVE $minhashSql,
      sig AS (
        SELECT doc_id, list(CAST(mh AS VARCHAR) ORDER BY j) AS sig
        FROM mh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, b,
          md5(sig[b*4+1] || ',' || sig[b*4+2] || ',' || sig[b*4+3] || ','
            || sig[b*4+4]) AS bh
        FROM sig, UNNEST(range(0, 4)) t(b)),
      cand AS (
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
      edges AS (
        SELECT a_id AS src, b_id AS dst FROM cand
        UNION SELECT b_id, a_id FROM cand),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
      lbl AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id)
      SELECT d.doc_id,
        COALESCE(l.group_id, d.doc_id) AS group_id,
        CASE WHEN COALESCE(l.group_id, d.doc_id) = d.doc_id THEN 1
          ELSE 0 END AS kept
      FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
      ORDER BY doc_id""")),

    // Markup stripping (TextAnalysis.stripMarkup): documents wrapped in
    // deterministic HTML chrome (tags, a script block whose body must
    // vanish whole, entities incl. the double-encoding case), stripped,
    // and fingerprinted. The oracle replays the identical RE2-portable
    // regex chain. Per-document output: range-partition the source.
    QueryDef("q69_html_strip",
      (s, d) => {
        val chrome = "</p><script type=\"text/javascript\">var x = " +
          "\"<b>\";</script><style>p { color: red }</style> " +
          "&amp;amp; &lt;tag&gt;</BODY></html>"
        val wrapped = documents(s, d)
          .repartitionByRange(col("doc_id"))
          .withColumn("text",
            concat(lit("<html><BODY class=\"x\"><p>"), col("text"),
              lit(chrome)))
        graft.ops.TextAnalysis.stripMarkup(wrapped, "text")
          .select(col("doc_id"), md5(col("stripped")).as("stripped_md5"),
            length(col("stripped")).as("stripped_len"))
          .sortWithinPartitions("doc_id")
      },
      Some("""WITH w AS (
        SELECT doc_id, '<html><BODY class="x"><p>' || text ||
          '</p><script type="text/javascript">var x = "<b>";</script>' ||
          '<style>p { color: red }</style> &amp;amp; &lt;tag&gt;' ||
          '</BODY></html>' AS t
        FROM documents),
      s1 AS (SELECT doc_id, regexp_replace(t,
        '(?is)<(script|style)\b[^>]*>.*?</(script|style)>', ' ', 'g')
        AS t FROM w),
      s2 AS (SELECT doc_id,
        regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s1),
      s3 AS (SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(t, '&lt;', '<', 'g'), '&gt;', '>', 'g'),
          '&quot;', '"', 'g'), '&#39;', chr(39), 'g'),
          '&amp;', '&', 'g') AS t FROM s2),
      f AS (SELECT doc_id,
        trim(regexp_replace(t, '\s+', ' ', 'g')) AS t FROM s3)
      SELECT doc_id, md5(t) AS stripped_md5, length(t) AS stripped_len
      FROM f ORDER BY doc_id""")),

    // Benchmark-contamination scan (TextAnalysis.contamination): corpus
    // docs sharing >=1 word-4-gram with the held-out benchmark subset
    // (doc_id % 50 == 0), with distinct shared-shingle counts — ONE
    // broadcast equi-join on the shingle, no doc-pair enumeration.
    QueryDef("q70_contamination",
      (s, d) => {
        val docs = documents(s, d)
        QueryDef.sortedP(
          graft.ops.TextAnalysis.contamination(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0),
            "doc_id", "text", n = 4),
          col("doc_id"))
      },
      Some("""WITH c AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE doc_id % 50 <> 0 AND length(trim(text)) > 0),
      b AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE doc_id % 50 = 0 AND length(trim(text)) > 0),
      shc AS (SELECT DISTINCT doc_id,
          ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
            AS s
        FROM c, UNNEST(range(1, len(ws) - 2)) t(i)),
      shb AS (SELECT DISTINCT
          ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
            AS s
        FROM b, UNNEST(range(1, len(ws) - 2)) t(i))
      SELECT shc.doc_id, count(DISTINCT s) AS n_shared
      FROM shc JOIN shb USING (s)
      GROUP BY shc.doc_id ORDER BY shc.doc_id""")),

    // SemDeDup-style semantic dedup (ops/Dedup.semanticDedup): IVF cell
    // structure → intra-cell pairwise cosine → transitive closure →
    // keep each group's centroid-NEAREST member. lloydRounds = 0 keeps
    // every centroid an exact corpus row, so the whole pipeline is
    // bit-reproducible in DuckDB (refined centroids are distributed
    // float means — run-stable but not bit-portable; they are covered
    // by ExtensionOpsSpec + tools/AnnRecall instead). The oracle
    // replays seeding (hash-lowest ids), rounded-cosine argmax
    // assignment, the pair threshold, and a WITH RECURSIVE min-label
    // fixpoint.
    QueryDef("q74_semantic_dedup",
      // GateKnobs.embSampleMod (default 1 = all rows): the DuckDB
      // replay of the clustering is quadratic within cells and its
      // recursive-CTE labeling exceeds DuckDB's memory at sf1 — the
      // big-scale gate verifies the identical pipeline on an id-stride
      // subsample instead (both sides read the same subset).
      (s, d) => graft.ops.Dedup.semanticDedup(
          Tables.embeddings(s, d)
            .filter(pmod(col("vec_id"), lit(GateKnobs.embSampleMod))
              === 0),
          "vec_id", "embedding",
          nCells = 8, threshold = 0.3, lloydRounds = 0)
        .transform(QueryDef.sortedP(_, col("vec_id"))),
      Some(s"""WITH RECURSIVE v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        WHERE vec_id % ${GateKnobs.embSampleMod} = 0),
      seeds AS (
        SELECT vec_id AS cent_id, e AS cv FROM v
        ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
          ::BIGINT
        LIMIT 8),
      score AS (
        SELECT v.vec_id, s.cent_id,
          round(list_cosine_similarity(v.e, s.cv), 6) AS csim
        FROM v, seeds s),
      cells AS (
        SELECT vec_id, cent_id AS cell, csim AS cent_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY csim DESC, cent_id) AS rn FROM score)
        WHERE rn = 1),
      cand AS (
        SELECT cx.vec_id AS a_id, cy.vec_id AS b_id
        FROM cells cx JOIN v x ON x.vec_id = cx.vec_id
          JOIN cells cy ON cx.cell = cy.cell
          JOIN v y ON y.vec_id = cy.vec_id
        WHERE cx.vec_id < cy.vec_id
          AND list_cosine_similarity(x.e, y.e) >= 0.3),
      edges AS (
        SELECT a_id AS src, b_id AS dst FROM cand
        UNION SELECT b_id, a_id FROM cand),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e
          ON e.src = reach.id),
      lbl AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id),
      gr AS (
        SELECT c.vec_id, c.cell, c.cent_sim,
          COALESCE(l.group_id, c.vec_id) AS group_id
        FROM cells c LEFT JOIN lbl l ON c.vec_id = l.id)
      SELECT vec_id, cell, cent_sim, group_id,
        (row_number() OVER (PARTITION BY group_id
          ORDER BY cent_sim DESC, vec_id)) = 1 AS kept
      FROM gr ORDER BY vec_id"""))
  )
}
