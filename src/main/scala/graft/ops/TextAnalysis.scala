package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Text-analysis operators: language ID, quality scoring, token counting,
  * document fingerprinting. All pure per-row column expressions — they
  * stay inside whole-stage codegen and scale linearly with the scan.
  */
object TextAnalysis {

  val defaultStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  // native codegen'd set-membership count (one hashed-set loop per row;
  // the size(filter(isin)) HOF chain it replaces is interpreted per
  // element) — semantics identical, property-tested in PlansSpec
  private def hits(ws: Column, l: Seq[String]): Column =
    graft.plans.CountInSetExpr.countInSet(ws, l)

  /** Stopword-hit language scores + CJK char count, argmax with a fixed
    * tie order. Adds `predicted_lang`.
    *
    * The split is over the RAW text with per-word case folding
    * (`countInSetLower`) — identical counts to splitting `lower(text)`
    * (lowercasing never touches whitespace), but the expression is
    * shared with [[qualityScore]]'s split through codegen CSE when the
    * two fuse into one projection (the curate shape), halving the
    * regex-split work per row. */
  def languageId(docs: DataFrame, textCol: String): DataFrame = {
    val ws = Fns.words(col(textCol))
    val s = defaultStopwords.map { case (l, sw) =>
      l -> graft.plans.CountInSetExpr.countInSetLower(ws, sw) }
    // existence test, not a count: rlike stops at the first CJK char,
    // where size(regexp_extract_all(...)) materialized an array of
    // every match per row (measured on the q53 curation profile)
    val zh = col(textCol).rlike("[一-鿿]")
    docs.withColumn("predicted_lang",
      when(zh, "zh")
        .when(s("en") >= s("de") && s("en") >= s("es") &&
          s("en") >= s("fr"), "en")
        .when(s("de") >= s("es") && s("de") >= s("fr"), "de")
        .when(s("es") >= s("fr"), "es")
        .otherwise("fr"))
  }

  /** Word/char/punct/stopword stats + composite quality score. */
  def qualityScore(docs: DataFrame, textCol: String): DataFrame = {
    val ws = Fns.words(col(textCol))
    val nWords = size(ws)
    val nStop = hits(ws, defaultStopwords("en"))
    val nPunct = regexp_count(col(textCol),
      lit("[^A-Za-z0-9\\s]"))
    docs
      .withColumn("n_words", nWords)
      .withColumn("stop_ratio", nStop / nWords)
      .withColumn("punct_ratio", nPunct / length(col(textCol)))
      .withColumn("quality_score",
        (nStop / nWords) * 0.5 +
          when(nWords >= 20, 0.5).otherwise(nWords * 0.025))
  }

  /** End-to-end corpus curation — the shape of a pretraining data
    * filter: quality gate (length + composite score) → language ID →
    * exact dedup keeping the lowest-id copy. All per-row stages fuse
    * into ONE codegen'd scan; the dedup adds the single content-hash
    * shuffle from [[Dedup.dropDuplicatesByContent]]. Returns surviving
    * rows with `predicted_lang`, `n_words`, `quality_score` attached.
    * Oracle-verified end to end (q53). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 10, minQuality: Double = 0.3): DataFrame = {
    val scored = languageId(qualityScore(docs, textCol), textCol)
      .filter(col("n_words") >= minWords &&
        col("quality_score") >= minQuality)
    Dedup.dropDuplicatesByContent(scored, idCol, textCol)
  }

  /** Whitespace + BPE-ish regex token counts. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("ws_tokens", size(Fns.words(col(textCol))))
      .withColumn("bpe_tokens", regexp_count(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")))

  /** Repetition signals — the Gopher-rule family of pretraining quality
    * filters (Rae et al. 2021 §A1.1: documents dominated by repeated
    * lines/words are boilerplate or spam): fraction of non-empty lines
    * that are repeats of an earlier line, and the same for words.
    * Pure per-row expressions (array_distinct over the split), zero
    * shuffles; empty docs score 0.0. */
  def repetitionSignals(docs: DataFrame, textCol: String): DataFrame = {
    def dupFrac(arr: Column): Column = {
      val n = size(arr)
      when(n > 0,
        (n - size(array_distinct(arr))).cast("double") / n)
        .otherwise(0.0)
    }
    val lines = filter(split(col(textCol), "\n"), l => length(l) > 0)
    docs
      .withColumn("dup_line_frac", dupFrac(lines))
      .withColumn("dup_word_frac", dupFrac(Fns.words(col(textCol))))
  }

  /** Markup stripping — the boilerplate-removal pass that turns crawled
    * HTML into trainable text: script/style blocks dropped whole, tags
    * removed, the five predefined HTML entities decoded, whitespace
    * collapsed. Lookaround- and backreference-free patterns (portable
    * to RE2, so the DuckDB oracle replays them verbatim — q69); order
    * matters and is part of the contract (blocks before tags, entities
    * after tags so `&lt;p&gt;` does not become a strippable tag). */
  def stripMarkup(docs: DataFrame, textCol: String,
      outCol: String = "stripped"): DataFrame = {
    val noBlocks = regexp_replace(col(textCol),
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    docs.withColumn(outCol,
      trim(regexp_replace(decoded, "\\s+", " ")))
  }

  /** Benchmark-contamination detection: corpus documents that share at
    * least one word-`n`-gram with any benchmark document — the
    * train/test overlap scan every pretraining pipeline runs before
    * shipping a corpus. Returns `(idCol, n_shared)` with the DISTINCT
    * shared-shingle count per contaminated document. Scale shape: both
    * sides explode to (id, shingle) sets and meet in ONE equi-join on
    * the shingle (the benchmark side is tiny — broadcast); no pairwise
    * doc×doc work anywhere. */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    // codegen'd shingle stream (Dedup.shinglesRaw — the transform-HOF
    // form measured 3.5s vs 0.4s here), broadcast-filtered FIRST: the
    // corpus side meets the (tiny, distinct) benchmark set in the scan
    // stage, so only hits reach any exchange; countDistinct in the
    // final (tiny) aggregation dedups per doc.
    Dedup.shinglesRaw(corpus, idCol, textCol, n)
      .join(broadcast(
        Dedup.shingles(bench, idCol, textCol, n)
          .select(col("s")).distinct()),
        Seq("s"))
      .groupBy(col("id").as(idCol))
      .agg(countDistinct(col("s")).as("n_shared"))
  }

  /** Containment-scored decontamination — [[contamination]]'s
    * hit-count generalized to the per-document containment FRACTION
    * |shingles(d) ∩ benchmark| / |shingles(d)| (Jaccard containment,
    * the asymmetric overlap measure decontamination actually
    * thresholds on: a 10-word quote inside a 10k-word doc is noise, a
    * benchmark question pasted verbatim into a short doc is
    * contamination). Returns EVERY corpus doc that produced at least
    * one shingle: `(idCol, n_shingles, n_shared, contaminated)`, with
    * the verdict decided by exact integer cross-multiplication
    * `n_shared * 100 >= n_shingles * thresholdPct` — no FP division
    * anywhere, so the flag is bit-portable at every scale. Scale
    * shape: ONE pass over the corpus shingle stream with a broadcast
    * LEFT join marking benchmark membership in the scan stage, then
    * one per-doc aggregation computing both distinct counts — no
    * second corpus scan, no doc×doc work. */
  def contaminationScore(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      thresholdPct: Int = 50): DataFrame = {
    val benchSet = broadcast(
      Dedup.shingles(bench, idCol, textCol, n)
        .select(col("s")).distinct()
        .withColumn("__hit", lit(1)))
    Dedup.shinglesRaw(corpus, idCol, textCol, n)
      .join(benchSet, Seq("s"), "left")
      .groupBy(col("id").as(idCol))
      .agg(countDistinct(col("s")).as("n_shingles"),
        countDistinct(when(col("__hit") === 1, col("s")))
          .as("n_shared"))
      .withColumn("contaminated",
        col("n_shared") * 100 >= col("n_shingles") * thresholdPct)
  }

  /** PII redaction: emails, IPv4 addresses and international phone
    * numbers replaced with typed placeholder tags — the masking pass a
    * training pipeline runs before tokenization. Conservative
    * lookaround-free patterns (portable across Java regex and RE2, so
    * the DuckDB oracle replays them verbatim); chain order matters and
    * is part of the contract (emails first, so user@host is not
    * half-eaten by the IP pattern). */
  def redactPii(docs: DataFrame, textCol: String,
      outCol: String = "redacted"): DataFrame =
    docs.withColumn(outCol,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
        "\\+\\d{7,15}", "<PHONE>"))

  /** Sequence chunking — split each document's token stream into
    * fixed-size windows with `overlap` tokens of context carry-over:
    * the packing step that turns documents into training-context rows.
    * One row per chunk `(…, chunk_idx, chunk_tokens, n_tokens)`;
    * the final chunk may be short; empty documents yield no chunks.
    * Pure explode over a per-row `sequence` — no shuffle; at 100 TB
    * this is a flatMap-shaped scan whose output partitioning follows
    * the input's. */
  def chunkTokens(docs: DataFrame, textCol: String, chunkSize: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = regexp_extract_all(col(textCol),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    docs
      .withColumn("__toks", toks)
      .withColumn("__start",
        explode(when(size(col("__toks")) > 0,
          sequence(lit(0), size(col("__toks")) - 1, lit(step)))
          .otherwise(array().cast("array<int>"))))
      .select(docs.columns.map(col) :+
        (col("__start") / step).cast("int").as("chunk_idx") :+
        slice(col("__toks"), col("__start") + 1, lit(chunkSize))
          .as("chunk_tokens"): _*)
      .withColumn("n_tokens", size(col("chunk_tokens")))
  }

  /** Polynomial rolling-hash fingerprint (base 31, mod 1e9+7) of the
    * first `prefixLen` chars — an ordered left fold over the codepoints. */
  def fingerprint(docs: DataFrame, textCol: String,
      prefixLen: Int = 64): DataFrame =
    docs.withColumn("fingerprint",
      aggregate(
        transform(split(substring(col(textCol), 1, prefixLen), ""),
          c => ascii(c)),
        lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L))

  /** Word-n-gram span stream with 1-based start positions: one row per
    * `(id, pos, s)`. The [[Dedup.shinglesRaw]] shifted-slice zip shape
    * (stays in whole-stage codegen — the `transform` HOF form is
    * interpreted per element and measured 8x slower on this corpus),
    * with `posexplode` carrying the start index that plain shingling
    * throws away. */
  def spanStream(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val shifted = Seq(col("id"), col("w0")) ++ (1 until n).map(k =>
      slice(col("w0"), lit(k + 1), size(col("w0")) - k).as(s"w$k"))
    val named = docs
      .select(col(idCol).as("id"), Fns.words(col(textCol)).as("w0"))
      .filter(size(col("w0")) >= n)
      .select(shifted: _*)
    named
      .select(col("id"), posexplode(
        arrays_zip((0 until n).map(k => col(s"w$k")): _*)).as(Seq("p", "z")))
      .filter(col(s"z.w${n - 1}").isNotNull)
      .select(col("id"), (col("p") + 1).cast("long").as("pos"),
        concat_ws(" ", (0 until n).map(k => col(s"z.w$k")): _*).as("s"))
  }

  /** Duplicated-span starts — the detection half of exact substring
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": verbatim n-gram spans shared across
    * documents are memorization fuel): `(id, pos)` of every span whose
    * exact text occurs in at least `minDf` DISTINCT documents.
    *
    * Scale shape: spans meet in ONE aggregation on a 60-bit span hash
    * (fixed-width shuffle key, never the span text — the
    * [[Dedup.ngramJaccard]] discipline; a false hit needs an md5-60bit
    * collision among distinct spans, ~n²/2^61), and the surviving dup
    * set — bounded by TRUE cross-document duplication, not corpus
    * size — joins back hash-clustered. The span stream has two
    * consumers (the df aggregation + the join-back), so it is
    * localCheckpoint'd once rather than exploded twice. */
  def dupSpanStarts(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    val sp = spanStream(docs, idCol, textCol, n)
      .select(col("id"), col("pos"), Fns.portableHash60(col("s")).as("h"))
      .localCheckpoint(false)
    val dup = sp.groupBy("h")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"))
    sp.join(dup, Seq("h")).select(col("id"), col("pos"))
  }

  /** Exact duplicated-substring removal: every word position covered by
    * a duplicated span ([[dupSpanStarts]] — a span at start `s` covers
    * positions `[s, s+n-1]`) is dropped and the survivors are rejoined
    * in order. Adds `n_removed` and `clean_text` (NULL when the whole
    * document was duplicated spans). Returns one row per input row;
    * documents with no duplicated span pass through with their text
    * intact and `n_removed = 0`.
    *
    * Scale shape: dup starts aggregate to ONE small array per affected
    * document (bounded by that document's own length, not the corpus)
    * and join back on the id — the word stream itself never rides a
    * shuffle. Coverage is then a per-row masked filter over the words
    * array; the per-position `exists` over the start list is quadratic
    * only in the DOCUMENT's own dup-span count, and the interpreted
    * HOF cost is confined to the (duplication-bounded) joined rows'
    * arrays — unlike the corpus-wide span stream, which stays codegen. */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    val starts = dupSpanStarts(docs, idCol, textCol, n, minDf)
      .groupBy(col("id").as("__sid"))
      .agg(collect_list(col("pos")).as("__ds"))
    val joined = docs.join(starts, col(idCol) === col("__sid"), "left")
    val ws = Fns.words(col(textCol))
    val ds = coalesce(col("__ds"), array().cast("array<long>"))
    val keep = filter(ws, (w, i) =>
      !exists(ds, s => s <= i + 1 && i + 1 < s + n))
    joined
      .withColumn("__keep", keep)
      .withColumn("n_removed",
        (size(ws) - size(col("__keep"))).cast("long"))
      .withColumn("clean_text",
        when(size(col("__keep")) > 0, array_join(col("__keep"), " ")))
      .drop("__sid", "__ds", "__keep")
  }

  /** CCNet-style unigram language-model quality score (Wenzek et al.
    * 2020 filter corpora by LM perplexity; the unigram case is the
    * join-expressible core): each document's mean negative natural
    * log-probability per word under the corpus's OWN unigram model.
    * Low = stereotypical text, high = rare-word soup. Returns
    * `(id, n_words, lm_nll)`.
    *
    * Cross-engine determinism: the only libm call (`ln`) is rounded to
    * 6 dp per WORD TYPE (the q74 discipline) and per-document totals
    * are exact decimal sums of those rounded values, so summation
    * order — which Spark and DuckDB disagree on — cannot change the
    * result; the final per-word mean is a single double division.
    * Scale shape: one aggregation over the word stream builds the
    * vocabulary; the probability table joins back on the word with an
    * EXPLICIT broadcast of the vocab side (`unigramBroadcastVocab =
    * false` for web-scale vocabularies → plain hash-clustered
    * equi-join). Explicit because Spark's size estimate for the word
    * stream is the PRE-explode document size, which sat under the
    * broadcast threshold at mid scale and flipped the join to
    * BuildLeft — broadcasting the exploded CORPUS (37M rows at sf3,
    * measured 11 s vs 4 s at sf10 where the estimate crossed the
    * threshold and the plan fell back to the sane shuffle join).
    * Never let a planner pick the build side of a join whose one leg
    * is corpus-proportional: the estimate, not the data, decides. */
  def unigramLmScore(docs: DataFrame, idCol: String,
      textCol: String, broadcastVocab: Boolean = true): DataFrame = {
    val w = docs.select(col(idCol).as("id"),
      explode(Fns.words(col(textCol))).as("w"))
    val counts = w.groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("tot"))
    val probs = counts.crossJoin(broadcast(total))
      .select(col("w"),
        round(-log(col("cnt").cast("double") / col("tot").cast("double")),
          6).cast("decimal(28,6)").as("nll"))
    val probSide = if (broadcastVocab) broadcast(probs)
      else probs.hint("shuffle_hash")
    w.join(probSide, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        (sum(col("nll")).cast("double") / count(lit(1))).as("lm_nll"))
  }

  /** BM25 ranking (Robertson-Spärck Jones; the retrieval scorer behind
    * corpus search and RAG recall baselines): top-`topK` documents for
    * a bag of query `terms`. idf uses the +1 form (Lucene's, always
    * positive); document length normalizes against the corpus mean.
    *
    * Cross-engine determinism: libm `ln` is rounded to 6 dp per TERM,
    * per-(doc, term) partial scores are rounded to 6 dp and totaled as
    * exact decimals (order-free), and every other step is IEEE
    * arithmetic on identically-derived doubles. Derived constants
    * (k1+1, 1-b) are computed ONCE here and interpolated into the SQL
    * mirror via Double.toString round-tripping, so both engines
    * multiply by bit-identical values.
    *
    * Scale shape: the term filter lands in the scan (a handful of query
    * terms), so only matching words reach the per-(doc, term)
    * aggregation; df and the 1-row corpus stats broadcast; the final
    * top-k is a TakeOrdered, never a global sort. */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one query term")
    val base = docs.select(col(idCol).as("id"),
      Fns.words(col(textCol)).as("__ws"))
      .select(col("id"), size(col("__ws")).cast("long").as("len"),
        col("__ws"))
    val stats = base.agg(count(lit(1)).as("nn"),
      sum(col("len").cast("decimal(28,0)")).cast("double").as("sumlen"))
    val tf = base
      .select(col("id"), col("len"), explode(col("__ws")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("id"), col("len"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val avgdl = col("sumlen") / col("nn")
    val idf = round(log((col("nn") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0), 6)
    val part = (col("tf") * lit(k1p1)) /
      (col("tf") + lit(k1) *
        (lit(oneMinusB) + (lit(b) * col("len")) / avgdl))
    tf.join(broadcast(dft), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("id"),
        round(idf * part, 6).cast("decimal(28,6)").as("st"))
      .groupBy(col("id"))
      .agg(sum(col("st")).cast("double").as("bm25"))
      .orderBy(desc("bm25"), col("id"))
      .limit(topK)
  }
}
