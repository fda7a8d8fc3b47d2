package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Distinct word-n-gram shingles: (id, s). */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(Fns.shingles(Fns.words(col(textCol)), n)).as("s"))
      .distinct()

  /** MinHash signature rows (id, j, mh) for `numHashes` family members
    * over word-n-gram shingles. */
  def minhash(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleN: Int = 3): DataFrame =
    shingles(docs, idCol, textCol, shingleN)
      .withColumn("j", explode(sequence(lit(0), lit(numHashes - 1))))
      .groupBy("id", "j")
      .agg(min(Fns.portableHash60(
        concat(col("j").cast("string"), lit(":"), col("s")))).as("mh"))

  /** MinHash-LSH candidate pairs: `bands` bands of `rowsPerBand` hashes;
    * pairs sharing any band bucket, with estimated Jaccard = matching
    * minhash fraction. Returns (a_id, b_id, est_sim). */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val mh = minhash(docs, idCol, textCol, numHashes)
    val sig = mh.groupBy("id")
      .agg(Fns.orderedCollect(col("j"), col("mh").cast("string")).as("sig"))
    val banded = sig
      .withColumn("b", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("id"), col("b"),
        md5(array_join(slice(col("sig"), col("b") * rowsPerBand + 1,
          lit(rowsPerBand)), ",")).as("bh"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
    cand.join(mh.as("ma"), col("a_id") === col("ma.id"))
      .join(mh.as("mb"),
        col("b_id") === col("mb.id") && col("ma.j") === col("mb.j"))
      .groupBy("a_id", "b_id")
      .agg((sum(when(col("ma.mh") === col("mb.mh"), 1).otherwise(0))
        .cast("double") / numHashes).as("est_sim"))
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
    * at `threshold`. Returns (a_id, b_id, inter, jaccard). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleN)
    val sz = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    sh.as("x").join(sh.as("y"),
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

  /** Embedding near-dup: pairwise cosine within blocking-key groups
    * (label, LSH bucket, IVF cell, ...) at `threshold`. The blocking
    * column bounds the pairwise work per group. */
  def embeddingNearDup(vecs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame =
    vecs.as("x").join(vecs.as("y"),
        col(s"x.$blockCol") === col(s"y.$blockCol") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
        Fns.cosine(col(s"x.$vecCol"), col(s"y.$vecCol")).as("sim"))
      .filter(col("sim") >= threshold)
}
