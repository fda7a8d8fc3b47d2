package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Deduplication operators for large-scale text corpora — exact,
  * MinHash-LSH, SimHash, and n-gram-Jaccard near-dup. All are
  * shuffle-by-key shapes: no global n² anywhere; pair enumeration only
  * happens inside LSH/band buckets or shared-shingle groups, which is the
  * standard scale path for 100 TB corpora.
  */
object Dedup {

  /** Exact dedup by content digest: one hash-groupBy shuffle. Returns
    * (content_hash, keep_id, copies) with keep-first (min id) policy. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Materialized exact dedup: the corpus with only the keep-first row
    * of each content group (the "write the deduped dataset" half).
    * Single-pass shape: ONE shuffle on the 128-bit digest and a
    * keep-first rank within each content group — the semi-join against
    * [[exact]]'s keep ids computes the identical rows but executes the
    * upstream pipeline TWICE (once per join side) and shuffles twice;
    * measured 1.7s → 1.0s on q53's curation tail, same rows. */
  def dropDuplicatesByContent(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__digest")).orderBy(col(idCol))
    docs.withColumn("__digest", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__digest")
  }

  /** Canonical text form for normalization-invariant dedup: case fold,
    * map Unicode whitespace (space separators `\p{Zs}` — NBSP,
    * en/em/ideographic space, precisely the `&nbsp;` remnants crawl
    * mirrors disagree on — plus line/paragraph separators and NEL) to
    * ASCII space, strip every remaining rune that is not a Unicode
    * letter, digit, or ASCII whitespace (punctuation, markup remnants,
    * emoji, zero-width junk), collapse runs of whitespace to one
    * space, trim. Without the Zs pre-map, `foo bar` deleted the
    * NBSP as non-content and concatenated the words — `foo bar` and
    * `foo bar` canonicalized DIFFERENTLY, defeating the stated
    * normalization-invariance. `\p{L}\p{N}` keeps CJK, Cyrillic,
    * accented and fullwidth letters as content (an earlier `[^a-z0-9]`
    * form silently deleted ALL non-ASCII letters, collapsing every
    * non-Latin document to one duplicate class); codepoint-level
    * lower + whitespace-map + `\p{L}\p{N}\s` parity with DuckDB is
    * probe-verified on a casing torture set (İ, ẞ, fullwidth, Roman
    * numerals, NBSP/em-space) and locked in by spec (`\x{...}` escapes
    * parse identically in Java regex and RE2; `\uXXXX` does not exist
    * in RE2). Documents with NO letter/digit content (pure
    * punctuation/emoji) still canonicalize to the empty string and
    * share one content class — content-free after normalization is a
    * deliberate merge, surfaced by `content_free` in
    * [[normalizedExact]]. Exposed so callers and the oracle share ONE
    * definition. */
  def canonicalText(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(textCol),
          "[\\p{Zs}\\x{2028}\\x{2029}\\x{0085}]", " "),
        "[^\\p{L}\\p{N}\\s]", ""),
      "\\s+", " "))

  /** Normalization-invariant exact dedup: [[exact]] over
    * [[canonicalText]] — catches the trivial-edit duplicates (case,
    * punctuation, reflowed whitespace) that byte-exact dedup misses and
    * MinHash spends candidate pairs on. Same single hash-groupBy
    * shuffle; the canonicalization is per-row codegen'd expression
    * work, so the operator costs exactly what [[exact]] costs plus
    * three regex passes per row.
    *
    * `content_free` marks the one deliberate non-content merge: docs
    * whose canonical form is EMPTY (pure punctuation/emoji) all share
    * one class. The flag lets downstream curation keep or drop
    * symbol-only docs explicitly instead of discovering the merge by
    * surprise. Computed from the group key itself (`content_hash =
    * md5('')`) — no second canonicalization pass, and the oracle can
    * mirror it verbatim. */
  def normalizedExact(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.groupBy(md5(canonicalText(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .withColumn("content_free", col("content_hash") === md5(lit("")))

  /** Per-document curation decision, consuming [[normalizedExact]]'s
    * `content_free` flag downstream: the kept doc of each
    * non-content-free class is `keep`, its other members `drop_dup`,
    * and EVERY member of the content-free class (canonical form empty —
    * pure punctuation/emoji) is `drop_content_free`, keep_id included:
    * symbol-only docs carry no trainable content, so the class is
    * dropped whole rather than represented by one survivor.
    *
    * Cost shape: the [[normalizedExact]] aggregation shuffle plus one
    * shuffle join back to the corpus on the SAME key (content_hash) —
    * co-partitioned exchanges, no re-keying. The class table is
    * distinct-classes-sized (≪ corpus at any real dup rate) but grows
    * WITH the corpus, so this stays a shuffle join by design, never a
    * collect or a forced broadcast (AQE may still pick broadcast when
    * the class side measures small at runtime — correct both ways). */
  def curate(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val classes = normalizedExact(docs, idCol, textCol)
    docs.withColumn("content_hash", md5(canonicalText(col(textCol))))
      .join(classes, "content_hash")
      .withColumn("decision",
        when(col("content_free"), lit("drop_content_free"))
          .when(col(idCol) === col("keep_id"), lit("keep"))
          .otherwise(lit("drop_dup")))
  }

  /** Word-n-gram shingle stream (id, s), duplicates included. Built
    * from arrays_zip of shifted slices + explode — no lambda
    * higher-order functions, which are evaluated interpreted and
    * dominated the profile (a `transform`-based form measured 3.5s vs
    * 0.4s on the q70 corpus); this shape stays in whole-stage codegen.
    * Use when the consumer dedups anyway (countDistinct, min-hash). */
  def shinglesRaw(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val shifted = Seq(col("id"), col("w0")) ++ (1 until n).map(k =>
      slice(col("w0"), lit(k + 1), size(col("w0")) - k).as(s"w$k"))
    val named = docs
      .select(col(idCol).as("id"), Fns.words(col(textCol)).as("w0"))
      .filter(size(col("w0")) >= n)
      .select(shifted: _*)
    val z = explode(arrays_zip((0 until n).map(k => col(s"w$k")): _*))
    named.select(col("id"), z.as("z"))
      .filter(col(s"z.w${n - 1}").isNotNull)
      .select(col("id"),
        concat_ws(" ", (0 until n).map(k => col(s"z.w$k")): _*).as("s"))
  }

  /** Distinct word-n-gram shingles: (id, s). */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shinglesRaw(docs, idCol, textCol, n).distinct()

  /** MinHash signatures (id, sig: array<string> of `numHashes` member
    * minima) over word-n-gram shingles. One aggregation pass — the hash
    * family is `numHashes` min-aggregate expressions over the shingle
    * rows, NOT a ×numHashes row explode (which would multiply the
    * shuffle; the wide form shuffles each shingle row once). */
  def minhashSig(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleN: Int = 3): DataFrame = {
    val mins = (0 until numHashes).map(j =>
      min(Fns.hashMember(col("h"), j)).as(s"mh$j"))
    shingles(docs, idCol, textCol, shingleN)
      .select(col("id"), Fns.hashBase(col("s")).as("h"))
      .groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(j =>
        col(s"mh$j").cast("string")): _*).as("sig"))
  }

  /** MinHash-LSH candidate pairs: `bands` bands of `rowsPerBand` hashes;
    * pairs sharing any band bucket, with estimated Jaccard = matching
    * minhash fraction. Returns (a_id, b_id, est_sim).
    *
    * Exact-duplicate collapse (the FuzzyJoin/[[embeddingNearDup]]
    * discipline): banding and the band-bucket self-join run once per
    * DISTINCT signature and id pairs expand through each signature's
    * multiplicity afterwards. d verbatim copies of a document share an
    * identical signature, so the per-id form inflates every band
    * bucket d-fold and the self-join d²-fold (measured 3.3x wall on
    * the 10x-replicated sf1 corpus); per-distinct, join work is
    * independent of the corpus duplication factor and only the
    * (output-sized) expansion grows. Distinct signatures are named by
    * a 96-bit composite hash (xxhash64 + murmur3 over the sig array)
    * so the 16-element arrays never ride through the pair distinct or
    * the expansion joins; the candidate ordering tie-breaks equal
    * xxhash64 on the second hash, so a 64-bit collision between two
    * distinct signatures still yields their pair exactly once
    * (~2^-96 full-collision odds per pair — negligible). Identical
    * signatures agree on every minhash, so intra-group pairs carry
    * est_sim = 1.0 by construction. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    // signatures are the expensive subtree (shingle explode + wide
    // min-agg) and feed several consumers below (distinct reps + the
    // member expansion sides); one lazy local checkpoint materializes
    // them once per query instead of once per consumer
    val sig = minhashSig(docs, idCol, textCol, numHashes)
      .localCheckpoint(false)
    val rk1 = xxhash64(col("sig"))
    val rk2 = hash(col("sig"))
    val members = sig.select(rk1.as("__rk"), rk2.as("__rk2"), col("id"))
    val dist = sig.select(col("sig")).distinct()
      .select(col("sig"), rk1.as("__rk"), rk2.as("__rk2"))
    val banded = dist
      .withColumn("b", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("__rk"), col("__rk2"), col("sig"), col("b"),
        md5(array_join(slice(col("sig"), col("b") * rowsPerBand + 1,
          lit(rowsPerBand)), ",")).as("bh"))
    // est_sim is projected BEFORE the distinct, so the dedup shuffle
    // carries four longs + a double, never the signature arrays; it is
    // a pure function of the pair, so distinct-over-5-cols == distinct
    // pairs (at most `bands` redundant evaluations per pair)
    val repPairs = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          (col("x.__rk") < col("y.__rk") ||
            (col("x.__rk") === col("y.__rk") &&
              col("x.__rk2") < col("y.__rk2"))))
      .select(col("x.__rk").as("__rka"), col("x.__rk2").as("__rka2"),
        col("y.__rk").as("__rkb"), col("y.__rk2").as("__rkb2"),
        (size(filter(zip_with(col("x.sig"), col("y.sig"),
          (a, b) => a === b), m => m)).cast("double") / numHashes)
          .as("est_sim"))
      .distinct()
    val ma = members.select(col("__rk").as("__rka"),
      col("__rk2").as("__rka2"), col("id").as("__ida"))
    val mb = members.select(col("__rk").as("__rkb"),
      col("__rk2").as("__rkb2"), col("id").as("__idb"))
    val cross = repPairs
      .join(ma, Seq("__rka", "__rka2"))
      .join(mb, Seq("__rkb", "__rkb2"))
      .select(least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"),
        col("est_sim"))
    val intra = members.as("x").join(members.as("y"),
        col("x.__rk") === col("y.__rk") &&
          col("x.__rk2") === col("y.__rk2") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        lit(1.0).as("est_sim"))
    cross.unionByName(intra)
  }

  /** Per-document LSH candidate COUNT — the aggregate consumer of
    * [[minhashLsh]], the way `TemporalJoins.rangeCount` is the
    * aggregate consumer of `rangeJoin`: `(id, n_candidates)` where
    * n_candidates = how many other docs share a band bucket (or the
    * whole signature). The pair LIST grows with the square of the
    * corpus duplication factor (d copies of a doc contribute C(d,2)
    * intra pairs — measured 9.4x for 3.3x data on the sf10 corpus);
    * the COUNT needs none of it: group sizes and matched-partner sums
    * are computed at DISTINCT-signature granularity
    * (`partners(s) = (g(s)-1) + Σ_{s' banded with s} g(s')`), and the
    * only output-sized step is attaching each doc's count — rows =
    * docs, never pairs. Dedup triage ("which docs are heavily
    * duplicated") runs on this at any duplication factor.
    */
  def minhashLshCandidateCounts(docs: DataFrame, idCol: String,
      textCol: String, bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = minhashSig(docs, idCol, textCol, numHashes)
      .localCheckpoint(false)
    val rk1 = xxhash64(col("sig"))
    val rk2 = hash(col("sig"))
    val members = sig.select(rk1.as("__rk"), rk2.as("__rk2"), col("id"))
    val gcounts = members.groupBy("__rk", "__rk2")
      .agg(count(lit(1)).as("g"))
      .localCheckpoint(false) // feeds banding, both contribs, and base
    val banded = gcounts.join(
        sig.select(col("sig"), rk1.as("__rk"), rk2.as("__rk2"))
          .distinct(),
        Seq("__rk", "__rk2"))
      .withColumn("b", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("__rk"), col("__rk2"), col("g"), col("b"),
        md5(array_join(slice(col("sig"), col("b") * rowsPerBand + 1,
          lit(rowsPerBand)), ",")).as("bh"))
    // distinct-signature candidate pairs (one row per unordered pair,
    // both group sizes carried — no signature arrays travel)
    val sigPairs = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          (col("x.__rk") < col("y.__rk") ||
            (col("x.__rk") === col("y.__rk") &&
              col("x.__rk2") < col("y.__rk2"))))
      .select(col("x.__rk").as("__rka"), col("x.__rk2").as("__rka2"),
        col("x.g").as("ga"),
        col("y.__rk").as("__rkb"), col("y.__rk2").as("__rkb2"),
        col("y.g").as("gb"))
      .distinct()
    // partner mass flowing to each side of each signature pair
    val toA = sigPairs.select(col("__rka").as("__rk"),
      col("__rka2").as("__rk2"), col("gb").as("add"))
    val toB = sigPairs.select(col("__rkb").as("__rk"),
      col("__rkb2").as("__rk2"), col("ga").as("add"))
    val crossMass = toA.unionByName(toB)
      .groupBy("__rk", "__rk2").agg(sum(col("add")).as("cross"))
    val partners = gcounts.join(crossMass, Seq("__rk", "__rk2"), "left")
      .select(col("__rk"), col("__rk2"),
        (col("g") - 1 + coalesce(col("cross"), lit(0L)))
          .as("n_candidates"))
    members.join(partners, Seq("__rk", "__rk2"))
      .select(col("id"), col("n_candidates"))
  }

  /** SimHash signatures (id, simhash): `bits`-bit signature from per-word
    * hash votes, computed as `bits` conditional sums in a single
    * aggregation pass. Near-dups are pairs at small Hamming distance —
    * bucket by signature bands for candidate generation. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v$b"))
    docs.select(col(idCol).as("id"),
        explode(Fns.words(col(textCol))).as("w"))
      .withColumn("h", Fns.portableHash60(col("w")))
      .groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until bits).map(b =>
          when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact n-gram Jaccard over shared-shingle candidate pairs, filtered
    * at `threshold`. Returns (a_id, b_id, inter, jaccard).
    *
    * `maxDf` caps shingle document frequency before the pair join: an
    * ultra-common shingle (a stop-phrase appearing in df documents)
    * contributes df² candidate pairs — the quadratic blowup that kills
    * shared-shingle joins on web-scale corpora. Dropping those shingles
    * bounds per-key fan-out; sizes |A|,|B| are computed on the SAME
    * capped sets so the Jaccard stays internally consistent.
    *
    * The DEFAULT is finite: a shingle shared by >100k documents is a
    * stop-phrase, not near-duplication signal, and 100k² candidate pairs
    * from one key is an outage. Pass `Long.MaxValue` explicitly to get
    * the uncapped exact join on corpora known to be small. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3,
      maxDf: Long = 100000L): DataFrame = {
    // join on the 60-bit shingle hash, not the string: fixed-width join
    // keys sort/compare far faster through the shuffle; a false pair
    // needs an md5-60bit collision among the distinct shingles
    // (~n²/2^61 — negligible even at 100 TB corpus scale)
    val shAll = shingles(docs, idCol, textCol, shingleN)
      .select(col("id"), Fns.portableHash60(col("s")).as("s"))
    val sh =
      if (maxDf == Long.MaxValue) shAll
      else shAll.withColumn("__df",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("s")))
        .filter(col("__df") <= maxDf).drop("__df")
    // (A broadcast anti-join against the over-cap shingle list measured
    // 1.7x SLOWER than this count window at sf0.1: the window's
    // partition-by-s exchange is exactly the clustering the pair join
    // needs, so Catalyst reuses it, while the anti-join variant pays an
    // extra full aggregation pass over the shingle rows.)
    // the capped shingle set has FOUR consumers (both self-join sides +
    // both size joins); a lazy local checkpoint materializes it once
    // per query instead of re-running Generate+distinct+df-window per
    // consumer (exchange reuse alone doesn't cover the window on top;
    // measured 1.25×). NOT persist(): that would register in the
    // cross-query cache manager and serve repeated calls from cache —
    // a materialized view, not a faster query. At 100 TB note the
    // lineage cut: an executor loss forfeits its blocks, so on flaky
    // clusters prefer a reliable checkpoint dir (or accept recompute
    // by dropping the checkpoint — the join still reuses exchanges).
    val shC = sh.localCheckpoint(false)
    val sz = shC.groupBy("id").agg(count(lit(1)).as("sz"))
    shC.as("x").join(shC.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.as("sa"), col("a_id") === col("sa.id"))
      .join(sz.as("sb"), col("b_id") === col("sb.id"))
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("inter") / (col("sa.sz") + col("sb.sz") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a candidate-pair graph — the step that
    * turns LSH/Jaccard/embedding candidate PAIRS into dedup GROUPS
    * (transitive closure: if a~b and b~c, all three are one group).
    * Pregel-style min-label propagation: every node takes the minimum
    * label among itself and its neighbors until fixpoint — one shuffle
    * per round, O(max cluster diameter) rounds, which for near-dup
    * graphs is small (dup clusters are dense). Lineage is truncated
    * with `localCheckpoint` each round so the plan does not grow
    * exponentially across iterations (the standard Spark iterative-
    * algorithm discipline; GraphX does the same internally).
    * Returns (id, group_id = min id in the component).
    *
    * Size-gated hybrid, the broadcast-join-threshold philosophy:
    * candidate pairs are a THRESHOLD-FILTERED list, tiny relative to
    * the corpus, so when they fit `driverEdgeLimit` (integer ids only)
    * the components come from a driver union-find in one collect —
    * zero iterative jobs. Past the gate (or for non-integer ids) the
    * distributed min-label loop below runs; both paths produce the
    * identical (id, min-id) result (spec-asserted). The gate bounds
    * driver memory at roughly 50-100 B/edge (specialized long-pair
    * tuples via the typed collect, plus the transient distinct-node
    * array): 2M edges ≈ low hundreds of MB — size driverEdgeLimit to
    * the driver heap, not to the corpus. */
  def nearDupGroups(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, driverEdgeLimit: Long = 2000000L): DataFrame = {
    // materialize the candidate pairs ONCE: both union branches below
    // read them, and `pairs` is typically an expensive pipeline (LSH
    // banding) that would otherwise execute per branch (measured ~2x
    // the LSH cost on q65)
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val idType = p.schema("a").dataType
    val integral = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType ||
      idType == org.apache.spark.sql.types.ShortType
    if (integral && p.count() <= driverEdgeLimit)
      return localComponents(p, idType)
    // undirected edge list, both directions
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      // ONE join + one agg per round. Pointer halving (path
      // compression — adopt the label OF the current label, so the
      // walk to the component minimum doubles its stride each round
      // and converges in O(log diameter), not O(diameter)) is FUSED
      // into the neighbor-min lookup: labels are node ids, so the
      // pointer hop `label(label(id))` is just the neighbor-min over
      // an extra edge (id → current label), and the union feeds the
      // same shuffle write — no extra stage. No own-label re-join
      // either: that pointer edge contributes `label(label(id)) ≤
      // label(id)`, so the neighbor-min alone is non-increasing.
      val augEdges = edges.union(
        labels.select(col("id").as("src"), col("label").as("dst")))
      val next = augEdges
        .join(labels.select(col("id").as("dst"),
          col("label").as("dst_label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("label"))
        // LAZY checkpoint: the convergence probe below materializes
        // it, so lineage-cut + convergence check are ONE action per
        // round (eager checkpoint + separate count was two)
        .localCheckpoint(false)
      // per-node labels are non-increasing, so the label SUM strictly
      // decreases until fixpoint — convergence reads off a 1-row
      // exact-decimal aggregate of the frame the checkpoint action
      // materializes anyway (no changed-flag join, no second action)
      val s = Option(next
        .agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
      changed = prevSum == null || s.compareTo(prevSum) != 0
      prevSum = s
      labels = next
      iter += 1
    }
    if (changed) {
      // Exiting at maxIter without a fixpoint means chain-shaped
      // components deeper than maxIter hops are still split — callers
      // would silently keep several representatives of one dup cluster.
      // Fail loudly; the caller chooses whether to raise maxIter.
      throw new IllegalStateException(
        s"nearDupGroups did not converge after $maxIter iterations " +
          "(labels still changing); raise maxIter — rounds needed ≈ " +
          "log2(max component diameter), which this graph exceeds")
    }
    labels.withColumnRenamed("label", "group_id")
  }

  /** Driver union-find over a collected (a, b) edge list — the
    * below-the-gate branch of [[nearDupGroups]]. Union-by-minimum
    * (the smaller root becomes parent) + full path compression, so a
    * component's root IS its minimum id; near-linear in edges. */
  private def localComponents(p: DataFrame,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    // typed collect: primitive-specialized (Long, Long) tuples land on
    // the driver directly — a Row collect would materialize boxed
    // values plus a second tuple array, ~10x the transient footprint
    val es = p.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression: repoint the walked chain at r
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2))
      .toArray.distinct
    nodes.map(n => (n, find(n))).toSeq.toDF("id", "group_id")
      .select(col("id").cast(idType).as("id"),
        col("group_id").cast(idType).as("group_id"))
  }

  /** Materialized near-dup removal: keep one representative (the
    * min-id member) per connected component of the candidate-pair
    * graph; rows that appear in no pair survive untouched. */
  def dropNearDuplicates(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id"): DataFrame = {
    val losers = nearDupGroups(pairs, aCol, bCol)
      .filter(col("id") =!= col("group_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding near-dup: pairwise cosine within blocking-key groups
    * (label, LSH bucket, IVF cell, ...) at `threshold`. The blocking
    * column bounds the pairwise work per group.
    *
    * Exact-duplicate collapse (the FuzzyJoin discipline): the cosine
    * runs once per DISTINCT (block, vector) pair and id pairs expand
    * through each vector's multiplicity afterwards — d verbatim copies
    * of a vector otherwise inflate the pairwise work d²-fold (the 10x
    * replicated sf1 corpus pays ~100x). Distinct vectors are named by
    * a 96-bit composite hash (xxhash64 + murmur3 over the block and
    * array), never carried through the expansion joins; a full
    * collision across both hashes would merge two distinct vectors
    * (~2^-96 per pair — negligible at any corpus size). */
  def embeddingNearDup(vecs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val rk1 = xxhash64(col(blockCol), col(vecCol))
    val rk2 = hash(col(vecCol))
    val members = vecs.select(rk1.as("__rk"), rk2.as("__rk2"),
      col(idCol))
    val dist = vecs.select(col(blockCol), col(vecCol)).distinct()
      .select(col(blockCol), col(vecCol), rk1.as("__rk"),
        rk2.as("__rk2"))
    val repPairs = dist.as("x").join(dist.as("y"),
        col(s"x.$blockCol") === col(s"y.$blockCol") &&
          (col("x.__rk") < col("y.__rk") ||
            (col("x.__rk") === col("y.__rk") &&
              col("x.__rk2") < col("y.__rk2"))))
      .select(col("x.__rk").as("__rka"), col("x.__rk2").as("__rka2"),
        col("y.__rk").as("__rkb"), col("y.__rk2").as("__rkb2"),
        Fns.cosine(col(s"x.$vecCol"), col(s"y.$vecCol")).as("sim"))
      // nondeterministic barrier column: keeps the similarity predicate
      // from being substituted into the join condition (it would run
      // the full dot product per candidate pair, twice)
      .withColumn("__barrier", monotonically_increasing_id())
      .filter(col("sim") >= threshold)
      .drop("__barrier")
    val ma = members.select(col("__rk").as("__rka"),
      col("__rk2").as("__rka2"), col(idCol).as("__ida"))
    val mb = members.select(col("__rk").as("__rkb"),
      col("__rk2").as("__rkb2"), col(idCol).as("__idb"))
    val cross = repPairs
      .join(ma, Seq("__rka", "__rka2"))
      .join(mb, Seq("__rkb", "__rkb2"))
      .select(least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"), col("sim"))
    // intra-duplicate pairs: C(g, 2) per duplicated vector at the
    // vector's self-cosine (subject to the same threshold, so an
    // all-zero vector's NaN self-sim stays excluded as before)
    val self = dist.select(col("__rk"), col("__rk2"),
        Fns.cosine(col(vecCol), col(vecCol)).as("sim"))
      .withColumn("__barrier", monotonically_increasing_id())
      .filter(col("sim") >= threshold)
      .drop("__barrier")
    val intra = members.as("x").join(members.as("y"),
        col("x.__rk") === col("y.__rk") &&
          col("x.__rk2") === col("y.__rk2") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
        col("x.__rk").as("__rk"), col("x.__rk2").as("__rk2"))
      .join(self, Seq("__rk", "__rk2"))
      .select(col("a_id"), col("b_id"), col("sim"))
    cross.unionByName(intra)
  }

  /** SemDeDup-style semantic deduplication (embedding clustering →
    * intra-cluster pairwise cosine → keep each duplicate group's
    * centroid-NEAREST member): composes [[graft.ops.Similarity
    * .ivfCentroids]] cell structure, [[embeddingNearDup]] blocking
    * (pairwise work bounded per cell — never corpus²), and
    * [[nearDupGroups]] transitive closure. The keep rule prefers the
    * most prototypical member (highest cosine to its cell centroid,
    * ties to the lowest id), unlike [[dropNearDuplicates]]'s min-id
    * rule. Assignment + keep decisions compare ROUNDED (6 dp) cosines
    * so the argmax is reproducible across engines (the q25/q26
    * discipline). Returns (id, cell, cent_sim, group_id, kept).
    *
    * With `lloydRounds = 0` every centroid is an exact corpus row and
    * the whole pipeline is deterministic cross-engine (oracle q74);
    * refined centroids (distributed float means) are run-stable but
    * not bit-portable, so they stay out of the oracle path. */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, threshold: Double, lloydRounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = (c: org.apache.spark.sql.Column) =>
      transform(c, _.cast("double"))
    val centroids = graft.ops.Similarity
      .ivfCentroids(vecs, idCol, vecCol, nCells, lloydRounds)
      .select(col("cent_id"), col("cv"),
        sqrt(Fns.dotProduct(col("cv"), col("cv"))).as("__cnorm"))
    val scored = vecs
      .select(col(idCol), dd(col(vecCol)).as("__ed"),
        sqrt(Fns.dotProduct(dd(col(vecCol)), dd(col(vecCol))))
          .as("__norm"))
      .join(broadcast(centroids))
      .select(col(idCol), col("__ed"), col("cent_id"),
        round(Fns.dotProduct(col("__ed"), col("cv"))
          / (col("__norm") * col("__cnorm")), 6).as("__csim"))
    // argmax centroid per vector: map-side-combinable min_by, ties to
    // the lower cent_id
    val cells = scored.groupBy(idCol)
      .agg(
        min_by(struct(col("cent_id"), col("__csim")),
          struct(negate(col("__csim")), col("cent_id"))).as("__best"),
        first(col("__ed")).as("__ed"))
      .select(col(idCol), col("__best.cent_id").as("cell"),
        col("__best.__csim").as("cent_sim"), col("__ed"))
    val pairs = embeddingNearDup(
      cells.select(col(idCol), col("cell"), col("__ed").as(vecCol)),
      idCol, vecCol, "cell", threshold)
    val groups = nearDupGroups(pairs, "a_id", "b_id")
      .withColumnRenamed("id", idCol)
    cells.join(groups, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("group_id"), col(idCol)))
      .withColumn("kept", row_number().over(
        Window.partitionBy("group_id")
          .orderBy(desc("cent_sim"), col(idCol))) === 1)
      .select(col(idCol), col("cell"), col("cent_sim"),
        col("group_id"), col("kept"))
  }
}
