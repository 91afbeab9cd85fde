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
 * all-pairs) and the responsibility is the CALLER's: pick keys with
 * bounded selectivity. The plan audit's no-cartesian sweep only catches
 * a CONSTANT key folded into a cross product — a runtime-degenerate key
 * (every row hashing to one block) compiles to a normal equi-join no
 * audit can see.
 *
 * NULL contract: records whose block key or name evaluates to NULL
 * never pair (SQL join/verify semantics) — filtered explicitly so the
 * behavior is a documented contract, not an accident of null
 * propagation.
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
      .filter(col("blk").isNotNull && col("name").isNotNull)
    t.as("a").join(t.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          // free pruning before any DP: |len(a) − len(b)| is a Levenshtein
          // lower bound, so most non-matches never reach the scorer
          abs(length(col("a.name")) - length(col("b.name"))) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        // bounded 3-arg levenshtein: O(|s|·maxDist) banded DP with early
        // exit, returning −1 past the bound (exact distance within it) —
        // the verify stage is the operator's dominant cost
        levenshtein(col("a.name"), col("b.name"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }
}
