package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.TopKAgg

/** Corpus indexing primitives — the retrieval-side counterpart of the
  * dedup family: an inverted index (term → postings) and PMI-scored
  * bigram collocations (the association statistic behind phrase mining
  * and word-embedding pre-processing).
  *
  * Both are single-exchange shapes: tokenize per row (codegen'd split,
  * no UDFs), explode, and aggregate on the term key. Nothing here is
  * pairwise in documents — work is Σ doc lengths, the same asymptotics
  * a 100 TB crawl index build pays.
  */
object Index {

  /** Whitespace tokenization with case folding — the [[TextAnalysis]]
    * convention (`\s+` over trimmed text), lowered so postings merge
    * case variants. */
  private def tokens(textCol: String) =
    split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")

  /** Inverted index: one row per distinct term with document frequency,
    * total term frequency, and the sorted posting list serialized as a
    * comma-joined string (a STRING column hash-compares across engines;
    * a LIST would pin the gate to engine array-literal formatting).
    *
    * Shape: explode → per-(term, doc) count (map-side combinable) →
    * per-term aggregate. The posting list is bounded per term by
    * `maxPostings` the way real index layers shard giant postings
    * (stopword terms); `df`/`tf` stay EXACT over all docs — only the
    * materialized id list is capped, and `postings_capped` says so
    * loudly per row.
    *
    * The cap bounds AGGREGATION STATE, not just output: the posting
    * list is a [[graft.plans.TopKAgg]] (rank = id = doc_id, k =
    * maxPostings), so each term's buffer holds at most k ids and
    * map-side partial aggregation discards above-cutoff ids BEFORE
    * the exchange. The earlier `slice(array_sort(collect_list(...)))`
    * form produced identical rows but materialized a stopword term's
    * FULL doc-id list in one ObjectHashAggregate buffer first — a
    * single-buffer OOM at crawl scale. Doc ids must be long-castable
    * (the heap ranks native longs; a string-id corpus assigns
    * surrogate ids first, the standard index-build step).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 1000): DataFrame = {
    // Fail fast on a non-integral id column: the permissive cast below
    // would turn e.g. string ids into NULLs — silently collapsing all
    // such docs into one (term, NULL) tf/df group while TopKAgg drops
    // NULL ids from postings. A caller error must not become silent
    // corruption; string-id corpora assign surrogate long ids first.
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.ByteType] ||
      idType.isInstanceOf[org.apache.spark.sql.types.ShortType] ||
      idType.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
      idType.isInstanceOf[org.apache.spark.sql.types.LongType],
      s"invertedIndex needs an integral id column (byte/short/int/" +
        s"long); '$idCol' is $idType — assign surrogate long ids first")
    val perDoc = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(filter(tokens(textCol), t => length(t) > 0)).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum("tf").as("tf_total"),
        array_join(
          transform(
            TopKAgg.topK(col("doc_id"), col("doc_id"), maxPostings),
            p => p.getField("id").cast("string")),
          ",").as("postings"),
        (count(lit(1)) > maxPostings).as("postings_capped"))
  }

  /** PMI-scored adjacent-bigram collocations:
    * `pmi(x,y) = ln(n_pairs · c_xy / (c_x⋆ · c⋆y))` over ADJACENT token
    * pairs, where the marginals are the left/right occurrence counts of
    * the pair relation itself — so the log's argument is an exact
    * rational of counts on both engines.
    *
    * FP portability (the q84/q89 lesson): `ln` is the only libm call,
    * rounded to 6 dp per pair; no sums of rounded values follow (PMI is
    * per-pair terminal), so engine rounding can only diverge if a
    * quotient lands within an ulp of a half-1e-6 boundary — the
    * measure-zero class documented in PLANS.md. `minCount` keeps rare
    * (noise) pairs out and bounds the output to frequent collocations.
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    val toks = filter(tokens(textCol), t => length(t) > 0)
    val pairs = docs
      .select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))))
        .as("bg"))
      .select(col("bg.0").as("x"), col("bg.1").as("y"))
    // materialize the pair counts ONCE: three consumers below (the
    // marginal re-aggregations + the total) would otherwise each replay
    // the corpus tokenize+explode+exchange. The checkpoint holds the
    // DISTINCT-bigram relation — vocabulary²-bounded, not corpus-sized.
    val cxy = pairs.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(true)
    val cx = cxy.groupBy("x").agg(sum("c_xy").as("c_x"))
    val cy = cxy.groupBy("y").agg(sum("c_xy").as("c_y"))
    val n = cxy.agg(sum("c_xy").as("n_pairs"))
    cxy.filter(col("c_xy") >= minCount)
      .join(cx, "x").join(cy, "y").crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("c_xy"),
        round(log(col("n_pairs") * col("c_xy") /
          (col("c_x") * col("c_y"))), 6).as("pmi"))
  }
}
