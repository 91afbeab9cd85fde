package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocking + verify entity resolution — the two-stage shape every
 * record-linkage pipeline at scale uses (beyond the reference, which has
 * no string-matching surface):
 *
 *  1. BLOCK: a cheap deterministic key (sort-key fragment, phonetic code,
 *     n-gram) partitions the records; only same-block pairs become
 *     candidates, bounding the otherwise quadratic pair space at
 *     Σ|block|². The blocking key is the scale knob — the same contract
 *     as the LSH band in minhash dedup.
 *  2. VERIFY: exact edit distance (Spark's built-in codegen'd
 *     levenshtein) scores each candidate; pairs at most `maxDist` apart
 *     survive.
 *
 * One self-join on the block key + one per-pair scalar — no cross join,
 * no UDF. Skewed blocks are the hazard (a degenerate key collapses to
 * all-pairs); callers pick keys with bounded selectivity, and the plan
 * audit's no-cartesian sweep catches the degenerate compile.
 */
object EntityResolution {

  /**
   * Candidate duplicate pairs under a blocking key.
   *
   * @param df records
   * @param idCol unique record id (BIGINT-compatible)
   * @param nameCol the string attribute to match
   * @param blockKey evaluated against `df`'s columns
   * @param maxDist maximum Levenshtein distance (inclusive)
   * @return (id_a, id_b, dist INT) with id_a < id_b, one row per
   *         surviving same-block pair
   */
  def candidatePairs(df: DataFrame, idCol: String, nameCol: String,
                     blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val t = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("blk"))
    t.as("a").join(t.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
