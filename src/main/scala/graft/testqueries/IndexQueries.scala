package graft.testqueries

import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.ops.{BpeTrain, Dedup, Graphs, Index, Sampling, Sketches,
  Skew}
import graft.plans.TopKAgg

/** Indexing / retrieval / skew batch — q93-q101: bounded-state
  * per-group top-k, inverted index, PMI collocations, per-domain
  * quota, normalization-invariant dedup, salted two-phase aggregation,
  * BPE encode (tokenizer inference), Count-Min-pruned exact heavy
  * hitters, and triangle counting. Every query keeps the batch
  * disciplines: exact integer/decimal arithmetic wherever sums cross
  * an exchange, one `ln` rounded to 6 dp where FP is irreducible
  * (q95), and total-order sorts with unique tie-breaks.
  */
object IndexQueries {
  import Tables._

  /** q93 keep budget per order. */
  private val TopK = 2

  /** q94 posting-list cap. EXERCISED at sf1+ (the synthetic vocabulary
    * is ~31 terms over 50k+ docs, so every term's true list blows past
    * the cap and `postings_capped` flips true) while df/tf stay exact
    * corpus-wide counts. */
  private val MaxPostings = 1000

  /** q95 noise floor: adjacent pairs must occur this often. Pair
    * counts scale with corpus replication but PMI is scale-invariant
    * (k cancels in ln(kN·kc/(kc·kc))), so the verified values are
    * stable across sf. */
  private val MinPairCount = 3L

  /** q96 per-source keep budget. */
  private val Quota = 10

  /** q98 salt fan-out. */
  private val Salts = 16

  /** q112 join salt fan-out: the probe side's hot keys spread over
    * this many reducers; the dim side replicates this many times. */
  private val JoinSalts = 8

  /** q99 tokenizer: a fixed published merge list (the inference-side
    * contract — you apply a vocabulary, you don't relearn it per
    * corpus), chosen so every merge fires on the synthetic vocabulary
    * and later merges build on earlier ones (t+h, then th+e). */
  private val BpeMerges = Seq(
    "t" -> "h", "th" -> "e", "a" -> "n", "e" -> "r",
    "o" -> "r", "a" -> "t", "r" -> "o", "s" -> "t")

  /** q100 Count-Min geometry + heavy-hitter threshold: 150 distinct
    * users hash into width 64, so collision-inflated estimates create
    * false candidates that ONLY the exact confirm pass removes — both
    * halves of the sketch-prune-then-confirm contract are exercised.
    * Per-user counts sit at 49..86 at every sf (ScaleUp strides user
    * ids), putting 70 mid-distribution. */
  private val HhDepth = 4
  private val HhWidth = 64
  private val HhThreshold = 70L

  /** q101 graph: co-supply edges through high-quantity lineitems only
    * (quantity >= 48, the top ~5%) — the unfiltered co-order graph is
    * complete at every sf (100 suppliers, all pairs co-occur), which
    * would make triangle counting a degenerate C(n,3). */
  private val TriMinQty = 48.0

  def all: Seq[QueryDef] = Seq(

    // Bounded-state per-group top-k (native TopKAgg): the k best
    // lineitems per order by price, WITHOUT the window form's
    // full-data sort — map-side partial aggregation discards
    // below-cutoff rows before the exchange, so the shuffle carries at
    // most k pairs per (mapper, group). Price ranks as exact cents via
    // an explicit floor (both engines floor the same IEEE product;
    // a bare double->int cast would truncate in Spark and
    // round-half-even in DuckDB).
    QueryDef("q93_topk_per_group", {
      (s, d) =>
        val cents = floor(col("l_extendedprice") * 100).cast("long")
        QueryDef.sortedP(
          lineitem(s, d)
            .select(col("l_orderkey"), (-cents).as("negr"),
              col("l_linenumber").cast("long").as("lid"))
            .groupBy("l_orderkey")
            .agg(TopKAgg.topK(col("negr"), col("lid"), TopK).as("top"))
            .select(col("l_orderkey"), explode(col("top")).as("t"))
            .select(col("l_orderkey"), (-col("t.r")).as("price_cents"),
              col("t.id").as("l_linenumber")),
          col("l_orderkey"), col("price_cents").desc,
          col("l_linenumber"))
    },
      Some(s"""SELECT l_orderkey,
          CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_cents,
          l_linenumber::BIGINT AS l_linenumber
        FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_orderkey
          ORDER BY FLOOR(l_extendedprice * 100) DESC, l_linenumber)
          <= $TopK
        ORDER BY l_orderkey, price_cents DESC, l_linenumber""")),

    // Inverted index: term -> (df, total tf, sorted posting list as a
    // comma-joined string, capped at MaxPostings with a loud flag).
    // Explode + two-level aggregate — work is Σ doc lengths, the crawl
    // index build's asymptotics.
    QueryDef("q94_inverted_index",
      (s, d) => QueryDef.sortedP(
        Index.invertedIndex(documents(s, d), "doc_id", "text",
          MaxPostings),
        col("term")),
      Some(s"""WITH w AS (
          SELECT doc_id, w FROM (
            SELECT doc_id,
              unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents)
          WHERE w <> ''),
        pd AS (SELECT w, doc_id, COUNT(*)::BIGINT AS tf
          FROM w GROUP BY w, doc_id)
        SELECT w AS term, COUNT(*)::BIGINT AS df,
          SUM(tf)::BIGINT AS tf_total,
          array_to_string(
            list_slice(list_sort(list(doc_id)), 1, $MaxPostings),
            ',') AS postings,
          (COUNT(*) > $MaxPostings) AS postings_capped
        FROM pd GROUP BY w ORDER BY term""")),

    // PMI-scored adjacent-bigram collocations over the corpus. The one
    // libm call (ln of an exact count rational) is rounded to 6 dp and
    // is terminal — no downstream arithmetic on the rounded value.
    QueryDef("q95_pmi_bigrams",
      (s, d) => QueryDef.sortedP(
        Index.pmiBigrams(documents(s, d), "text", MinPairCount),
        col("x"), col("y")),
      Some(s"""WITH base AS (
          SELECT string_split_regex(lower(trim(text)), '\\s+') AS ws
          FROM documents),
        p AS (
          SELECT ws[i] AS x, ws[i + 1] AS y
          FROM base,
            LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)),
        cxy AS (SELECT x, y, COUNT(*)::BIGINT AS c_xy
          FROM p GROUP BY x, y),
        cx AS (SELECT x, SUM(c_xy)::BIGINT AS c_x FROM cxy GROUP BY x),
        cy AS (SELECT y, SUM(c_xy)::BIGINT AS c_y FROM cxy GROUP BY y),
        n AS (SELECT SUM(c_xy)::BIGINT AS n_pairs FROM cxy)
        SELECT x, y, c_xy,
          ROUND(ln((n_pairs * c_xy)::DOUBLE / (c_x * c_y)), 6) AS pmi
        FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN n
        WHERE c_xy >= $MinPairCount
        ORDER BY x, y""")),

    // Per-domain quota: at most `Quota` docs per source, longest-first
    // with a unique doc_id tie-break (replicated copies share n_chars —
    // a non-unique rank alone would be an engine-dependent sample).
    QueryDef("q96_domain_quota",
      (s, d) => QueryDef.sortedP(
        Sampling.groupQuota(documents(s, d), col("source"), Quota,
            col("n_chars").desc, col("doc_id"))
          .select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("doc_id")),
      Some(s"""SELECT doc_id, source, n_chars FROM documents
        QUALIFY row_number() OVER (PARTITION BY source
          ORDER BY n_chars DESC, doc_id) <= $Quota
        ORDER BY source, doc_id""")),

    // Normalization-invariant exact dedup: case folded, Unicode
    // whitespace mapped to space, punctuation stripped, whitespace
    // collapsed — the trivial-edit duplicates byte-exact dedup misses.
    // Same single-shuffle shape as q16; the canonical form is shared
    // between engines via one definition (Dedup.canonicalText ≡ the
    // SQL below; \x{...} escapes parse identically in Java regex and
    // RE2). content_free surfaces the deliberate symbol-only merge —
    // derived from the group key (= md5('')) on both sides.
    QueryDef("q97_normalized_dedup",
      (s, d) => QueryDef.sortedP(
        Dedup.normalizedExact(documents(s, d), "doc_id", "text"),
        col("content_hash")),
      Some("""WITH c AS (SELECT doc_id,
          md5(trim(regexp_replace(
            regexp_replace(
              regexp_replace(lower(text),
                '[\p{Zs}\x{2028}\x{2029}\x{0085}]', ' ', 'g'),
              '[^\p{L}\p{N}\s]', '', 'g'),
            '\s+', ' ', 'g'))) AS content_hash
        FROM documents)
        SELECT content_hash, MIN(doc_id) AS keep_id,
          COUNT(*) AS copies, content_hash = md5('') AS content_free
        FROM c GROUP BY content_hash ORDER BY content_hash""")),

    // Salted two-phase aggregation on the skewed event_type key:
    // bit-identical to the plain GROUP BY (integer counts, exact
    // decimal sums — re-association cannot move either), with the hot
    // key's reduction fanned over 16 reducers in phase 1.
    QueryDef("q98_salted_agg",
      (s, d) => Skew.saltedCountSum(events(s, d), col("event_type"),
          col("user_id"), col("value"), Salts)
        .orderBy("k"),
      Some("""SELECT event_type AS k, COUNT(*)::BIGINT AS n,
          SUM(CAST(value AS DECIMAL(28,2)))::DOUBLE AS s
        FROM events GROUP BY event_type ORDER BY k""")),

    // BPE tokenizer inference: apply the published merge list to every
    // word and report per-document word/subword counts. The merge
    // chain is sequential literal replaces over individually-wrapped
    // symbols (see BpeTrain.encodeTokenCounts: wrapping makes a
    // standard replace-all EXACTLY the leftmost-non-overlapping BPE
    // fold), so the identical chain runs verbatim in DuckDB.
    QueryDef("q99_bpe_encode",
      (s, d) => QueryDef.sortedP(
        BpeTrain.encodeTokenCounts(documents(s, d), "doc_id",
          col("text"), BpeMerges),
        col("doc_id")),
      Some {
        val enc = BpeMerges.foldLeft(
          """regexp_replace(replace(w, '|', ''), '(.)', '|\1|', 'g')""") {
          case (acc, (l, r)) => s"replace($acc, '|$l||$r|', '|$l$r|')"
        }
        s"""WITH w AS (
            SELECT doc_id,
              unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents WHERE length(trim(text)) > 0),
          enc AS (SELECT doc_id, $enc AS s FROM w)
          SELECT doc_id, COUNT(*)::BIGINT AS n_words,
            SUM((length(s) - length(replace(s, '|', ''))) // 2)::BIGINT
              AS n_subword_tokens
          FROM enc GROUP BY doc_id ORDER BY doc_id"""
      }),

    // Count-Min-pruned EXACT heavy hitters: the sketch (built in one
    // sketch-sized shuffle) broadcasts back as depth per-row probes;
    // rows whose estimate cannot reach the threshold die before any
    // key shuffle, and the exact count over survivors removes the
    // collision-inflated candidates. Result = plain HAVING, which is
    // precisely what the oracle runs.
    QueryDef("q100_cm_heavy_hitters",
      (s, d) => Sketches.cmHeavyHitters(events(s, d), col("user_id"),
          HhDepth, HhWidth, HhThreshold)
        .orderBy("key"),
      Some(s"""SELECT user_id AS key, COUNT(*)::BIGINT AS n
        FROM events GROUP BY user_id HAVING COUNT(*) >= $HhThreshold
        ORDER BY key""")),

    // Triangle count on the high-quantity co-supply graph via ordered
    // edge enumeration (a < b < c): wedge join + closing-edge
    // semi-join, Σ deg² work, no node² product anywhere.
    QueryDef("q101_triangle_count",
      (s, d) => {
        val li = lineitem(s, d).filter(col("l_quantity") >= TriMinQty)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
          .select(col("x.sk").as("src"), col("y.sk").as("dst"))
        Graphs.triangleCount(edges, "src", "dst")
      },
      Some(s"""WITH li AS (
          SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
          WHERE l_quantity >= $TriMinQty),
        p AS (SELECT DISTINCT x.sk AS a, y.sk AS b
          FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
        w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM p e1 JOIN p e2 ON e1.b = e2.a),
        t AS (SELECT COUNT(*)::BIGINT AS n_triangles FROM w
          WHERE EXISTS (SELECT 1 FROM p WHERE p.a = w.a AND p.b = w.c)),
        n AS (SELECT COUNT(*)::BIGINT AS n_nodes FROM
          (SELECT a FROM p UNION SELECT b FROM p)),
        e AS (SELECT COUNT(*)::BIGINT AS n_edges FROM p)
        SELECT n_nodes, n_edges, n_triangles FROM n, e, t""")),

    // Salted skew JOIN (the join counterpart of q98's salted agg):
    // lineitem ⋈ part on partkey with the probe side salted 8 ways and
    // the build side replicated 8×, then the per-size rollup. The
    // oracle computes the PLAIN join + GROUP BY — the hash match proves
    // the salting is invisible to semantics (counts are integers, sums
    // stay DECIMAL through the agg, so re-association cannot move
    // them). Why it exists at 100 TB: AQE's skew split only rescues
    // sort-merge joins, and a hot key inside a shuffled hash join still
    // lands one reducer; salting bounds every reducer's share at 1/8 of
    // the hot key BEFORE the exchange. The replicated side here is
    // dim-sized (part), the case the scaladoc carves out: too big to
    // broadcast comfortably at cluster scale, small enough to
    // replicate saltFactor ways.
    QueryDef("q112_salted_join",
      (s, d) => Skew.saltedJoin(
          lineitem(s, d).select(col("l_partkey"), col("l_quantity")),
          part(s, d).select(col("p_partkey").as("l_partkey"),
            col("p_size")),
          Seq("l_partkey"), JoinSalts)
        .groupBy("p_size")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(28,2)"))
            .cast("double").as("s"))
        .orderBy("p_size"),
      Some("""SELECT p_size, COUNT(*)::BIGINT AS n,
          SUM(CAST(l_quantity AS DECIMAL(28,2)))::DOUBLE AS s
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_size ORDER BY p_size"""))
  )
}
