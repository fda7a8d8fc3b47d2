package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join — the entity-resolution primitive.
  *
  * [[editDistanceJoin]] (d ≤ 2) is the SYMMETRIC-DELETE shape (the
  * SymSpell idea): every string expands to its ≤d-character-deletion
  * variants, candidates meet in ONE equi-join on
  * `(blocking keys, variant)` — for `lev(a,b) ≤ d` the two deletion
  * neighborhoods always intersect, so recall is exact — and one
  * Levenshtein per DISTINCT candidate pair refines. At 100 TB this is
  * a shuffle-by-key join (len+1 variant rows per string at d=1), never
  * a per-block n²; [[editDistanceJoinBlocked]] keeps the naive blocked
  * pairwise form for arbitrary d and as the parity reference
  * (OpsSpec). Measured on q73 (15k names, 125 blocks): naive 2.8s →
  * 1.0s (codegen'd variant generation, 64-bit hashed join keys, one
  * reused exchange for the self-join — shuffle_hash hint, since the
  * planner would otherwise driver-broadcast the whole variant stream).
  */
object FuzzyJoin {

  /** `array(s) ∪ all single-character deletions of s` in SQL (works on
    * characters, like `levenshtein`). */
  private def delExpr(src: String): String =
    s"array_union(array($src), transform(sequence(1, length($src)), " +
      s"i -> concat(substring($src, 1, i - 1), " +
      s"substring($src, i + 1, length($src)))))"

  /** All pairs `(a_id < b_id)` sharing every `blockCols` value with
    * `levenshtein(strCol) ≤ maxDist` (1 or 2). Returns
    * `(a_id, b_id, a_val, b_val, dist)` — identical rows to
    * [[editDistanceJoinBlocked]], spec-asserted.
    *
    * Exact-duplicate collapse first: the variant join runs once per
    * DISTINCT (blocks, string) and id pairs are expanded afterwards
    * through the multiplicity of each string. A duplication-heavy
    * corpus (the realistic 100 TB case — and the sf1 gate's 10x
    * replicated one) otherwise pays the join AND the Levenshtein
    * refine per id pair instead of per distinct-string pair: d dup
    * copies of a string inflate every variant bucket d-fold and every
    * true pair d²-fold. Measured on the 10x-replicated sf1 customer
    * table: 8.1s → per-distinct work identical to sf0.1's, with only
    * the (irreducible, output-sized) expansion joins growing.
    *
    * NULL-string contract: a NULL string matches nothing (`lev(NULL,·)`
    * is undefined) — no pair is emitted for it. The variant explode and
    * every join condition are null-rejecting, so this falls out of the
    * plan; [[editDistanceMatchCounts]] makes the same contract explicit
    * by emitting `n_matches = 0` for NULL-string ids. */
  def editDistanceJoin(rows: DataFrame, idCol: String, strCol: String,
      maxDist: Int, blockCols: Seq[String]): DataFrame = {
    val (members, repPairs) =
      candidateStringPairs(rows, idCol, strCol, maxDist, blockCols)
    // Expansion (output-sized, the irreducible part):
    // (a) cross-string pairs — every member of string A x every member
    //     of string B, ids normalized to a_id < b_id;
    // (b) intra-string pairs — C(g, 2) id pairs per duplicated string,
    //     dist 0 (empty when strings are unique per block).
    val ma = members.select(col("__rk").as("__rka"),
      col(idCol).as("__ida"), col(strCol).as("a_val"))
    val mb = members.select(col("__rk").as("__rkb"),
      col(idCol).as("__idb"), col(strCol).as("b_val"))
    val cross = repPairs
      .join(ma, Seq("__rka", "a_val"))
      .join(mb, Seq("__rkb", "b_val"))
      .select(
        least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"),
        when(col("__ida") < col("__idb"), col("a_val"))
          .otherwise(col("b_val")).as("a_val"),
        when(col("__ida") < col("__idb"), col("b_val"))
          .otherwise(col("a_val")).as("b_val"),
        col("dist"))
    val intra = members.as("x")
      .join(members.as("y").hint("shuffle_hash"),
        col("x.__rk") === col("y.__rk")
          && col(s"x.$strCol") === col(s"y.$strCol")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
        col(s"x.$strCol").as("a_val"), col(s"y.$strCol").as("b_val"),
        lit(0).as("dist"))
    cross.unionByName(intra)
  }

  /** Shared symmetric-delete core: `members` — one row per input id,
    * keyed by `__rk` (64-bit hash of blocks+string, the fixed-width
    * shuffle key naming a distinct (blocks, string) group) — and the
    * DISTINCT-string candidate pairs `(__rka, __rkb, a_val, b_val,
    * dist)` with `dist ≤ maxDist`. [[editDistanceJoin]] expands these
    * to id pairs (output-sized); [[editDistanceMatchCounts]] aggregates
    * them to per-id counts without materializing any id pair.
    */
  private def candidateStringPairs(rows: DataFrame, idCol: String,
      strCol: String, maxDist: Int, blockCols: Seq[String])
      : (DataFrame, DataFrame) = {
    require(maxDist >= 1 && maxDist <= 2,
      "symmetric-delete join supports maxDist 1..2; use " +
        "editDistanceJoinBlocked beyond that")
    val slim = rows.select(
      (blockCols.map(col) :+ col(idCol) :+ col(strCol)): _*)
    // __rk names a distinct (blocks, string) group; __bh the block.
    // Hash collisions never corrupt results: every join below also
    // matches on the string value itself (the candidate pair ordering
    // tie-breaks equal __rk on the string, so even a 64-bit __rk
    // collision between two distinct groups yields their pair exactly
    // once) — the hashes only slim the shuffle keys to fixed width
    // (the dedup-stack discipline).
    val rkExpr = xxhash64((blockCols.map(col) :+ col(strCol)): _*)
    val members = slim.select(rkExpr.as("__rk"), col(idCol),
      col(strCol))
    val reps = slim.select(
      (blockCols.map(col) :+ col(strCol)): _*).distinct()
      .select((rkExpr.as("__rk") +:
        xxhash64(blockCols.map(col): _*).as("__bh") +:
        blockCols.map(col)) :+ col(strCol): _*)
    // d=1 generates variants WITHOUT a higher-order lambda (interpreted
    // per element — measured 0.35s of q73's budget): explode the
    // deletion POSITION, then one codegen'd substring/concat projection
    // (position 0 = the identity variant).
    val exploded = maxDist match {
      case 1 => reps
        .withColumn("__i",
          explode(sequence(lit(0), length(col(strCol)))))
        .withColumn("__v", expr(
          s"CASE WHEN __i = 0 THEN $strCol ELSE " +
            s"concat(substring($strCol, 1, __i - 1), " +
            s"substring($strCol, __i + 1, length($strCol))) END"))
        .drop("__i")
      case _ => reps
        .withColumn("__v1", expr(delExpr(strCol)))
        .withColumn("__vars", array_distinct(expr(
          s"flatten(transform(__v1, s -> ${delExpr("s")}))")))
        .withColumn("__v", explode(col("__vars")))
        .drop("__v1", "__vars")
    }
    val ex = exploded.select(
      xxhash64((blockCols.map(col) :+ col("__v")): _*).as("__k"),
      col("__bh"), col("__rk"), col(strCol))
    // shuffle_hash hint: without it the planner broadcasts the whole
    // exploded variant stream (measured ~1s of driver collect + build
    // at sf0.1); a shuffle join lets the self-join REUSE one exchange
    // of the slim (k, bh, rk, s) rows for both sides.
    // One Levenshtein per DISTINCT candidate pair — Catalyst pushes
    // the <= maxDist refine into the join condition via the distinct.
    val repPairs = ex.as("x").join(ex.as("y").hint("shuffle_hash"),
        col("x.__k") === col("y.__k") && col("x.__bh") === col("y.__bh")
          && (col("x.__rk") < col("y.__rk") ||
            (col("x.__rk") === col("y.__rk") &&
              col(s"x.$strCol") < col(s"y.$strCol"))))
      .select(col("x.__rk").as("__rka"), col("y.__rk").as("__rkb"),
        col(s"x.$strCol").as("a_val"), col(s"y.$strCol").as("b_val"))
      .distinct()
      .withColumn("dist", levenshtein(col("a_val"), col("b_val")))
      .filter(col("dist") <= maxDist)
    (members, repPairs)
  }

  /** Per-id fuzzy-match COUNT — [[editDistanceJoin]]'s aggregate
    * consumer (the q109-for-q22 discipline applied to entity
    * resolution): on a duplication-heavy corpus the id-pair list grows
    * with duplication² (measured 7.5× for 3.3× data on the sf10
    * replicated corpus) but the triage question a 100 TB user actually
    * asks — "which records are heavily fuzzy-duplicated" — needs only
    * per-id counts. Group sizes and matched-partner sums are computed
    * at DISTINCT-string granularity:
    * `matches(s) = (g(s) − 1) + Σ_{s' : lev(s,s') ≤ d} g(s')`
    * and the only output-sized step is attaching each id's count —
    * rows out = ids, never pairs. Equals
    * `COUNT(*) OVER the editDistanceJoin pair list per id`
    * (oracle-checked, q113).
    *
    * Grouping keys carry the string VALUE alongside `__rk` so a 64-bit
    * hash collision between distinct groups cannot merge their counts
    * (the same both-hash-and-value discipline as the join). Returns
    * `(id, n_matches)`.
    *
    * NULL-string contract: `lev(NULL, ·)` is undefined, so a NULL
    * string matches nothing — [[editDistanceJoin]] emits no pair for
    * it (its join conditions are null-rejecting), and this count form
    * emits the id with `n_matches = 0` explicitly (split off BEFORE
    * the null-unsafe equi-joins, which would otherwise silently drop
    * the id and break the rows-out = ids contract).
    */
  def editDistanceMatchCounts(rows: DataFrame, idCol: String,
      strCol: String, maxDist: Int, blockCols: Seq[String]): DataFrame = {
    val nullIds = rows.filter(col(strCol).isNull)
      .select(col(idCol).as("id"), lit(0L).as("n_matches"))
    val (members, repPairs) = candidateStringPairs(
      rows.filter(col(strCol).isNotNull), idCol, strCol, maxDist,
      blockCols)
    // Checkpointed (the q109 pattern): gcounts feeds both withG joins
    // and the partners join, withG feeds both union branches — without
    // materialization each consumer re-runs the whole upstream pipeline
    // (the variant join included), observed as two full scan trees in
    // the physical plan.
    val gcounts = members.groupBy(col("__rk"), col(strCol))
      .agg(count(lit(1)).as("g"))
      .localCheckpoint(false)
    // partner mass flowing to each side of each distinct-string pair
    val withG = repPairs
      .join(gcounts.select(col("__rk").as("__rka"),
        col(strCol).as("a_val"), col("g").as("ga")), Seq("__rka", "a_val"))
      .join(gcounts.select(col("__rk").as("__rkb"),
        col(strCol).as("b_val"), col("g").as("gb")), Seq("__rkb", "b_val"))
      .localCheckpoint(false)
    val crossMass = withG.select(col("__rka").as("__rk"),
        col("a_val").as(strCol), col("gb").as("add"))
      .unionByName(withG.select(col("__rkb").as("__rk"),
        col("b_val").as(strCol), col("ga").as("add")))
      .groupBy(col("__rk"), col(strCol))
      .agg(sum(col("add")).as("cross"))
    val partners = gcounts.join(crossMass, Seq("__rk", strCol), "left")
      .select(col("__rk"), col(strCol),
        (col("g") - 1 + coalesce(col("cross"), lit(0L)))
          .as("n_matches"))
    members.join(partners, Seq("__rk", strCol))
      .select(col(idCol).as("id"), col("n_matches"))
      .unionByName(nullIds)
  }

  /** Naive blocked pairwise form: exact within blocks at any `maxDist`,
    * with a codegen'd length gate (`|len(a)−len(b)| ≤ d` is necessary
    * for `lev ≤ d`) ahead of the Levenshtein. Pairwise work is bounded
    * by the caller's blocking keys — the [[Dedup.embeddingNearDup]]
    * contract. */
  def editDistanceJoinBlocked(rows: DataFrame, idCol: String,
      strCol: String, maxDist: Int, blockCols: Seq[String]): DataFrame = {
    require(maxDist >= 0 && blockCols.nonEmpty,
      "editDistanceJoinBlocked needs maxDist >= 0 and a blocking key")
    val blockEq = blockCols.map(c => col(s"x.$c") === col(s"y.$c"))
      .reduce(_ && _)
    rows.as("x").join(rows.as("y"),
        blockEq &&
          col(s"x.$idCol") < col(s"y.$idCol") &&
          abs(length(col(s"x.$strCol")) - length(col(s"y.$strCol")))
            <= maxDist &&
          levenshtein(col(s"x.$strCol"), col(s"y.$strCol")) <= maxDist)
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
        col(s"x.$strCol").as("a_val"), col(s"y.$strCol").as("b_val"),
        levenshtein(col(s"x.$strCol"), col(s"y.$strCol")).as("dist"))
  }
}
