package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join — the entity-resolution primitive: candidate
  * pairs within user-supplied blocking keys, refined by an exact edit
  * distance. The 100 TB contract mirrors [[Dedup.embeddingNearDup]]:
  * the blocking columns BOUND the pairwise work per block (no global
  * n²); within a block, a cheap codegen'd length gate
  * (`||len(a)−len(b)| ≤ d` is necessary for `lev ≤ d`) prunes before
  * the O(len²) Levenshtein evaluates. Exactness within blocks —
  * recall across blocks is the caller's blocking-key choice, the
  * standard ER trade.
  */
object FuzzyJoin {

  /** All pairs `(a_id < b_id)` sharing every `blockCols` value with
    * `levenshtein(strCol) ≤ maxDist`. Returns
    * `(a_id, b_id, a_val, b_val, dist)`. */
  def editDistanceJoin(rows: DataFrame, idCol: String, strCol: String,
      maxDist: Int, blockCols: Seq[String]): DataFrame = {
    require(maxDist >= 0 && blockCols.nonEmpty,
      "editDistanceJoin needs maxDist >= 0 and at least one blocking key")
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
