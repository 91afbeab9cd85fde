package graft

import graft.er.EntityResolution
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("blocking bounds candidates; levenshtein verify; canonical pair order") {
    val recs = Seq(
      (1L, "alpha corp"), (2L, "alpha corp"),   // exact dup, same block
      (3L, "alpha c0rp"),                        // 1 substitution, same block
      (4L, "alpha corporation"),                 // same block, distance 7 → filtered
      (5L, "beta corp"),                         // different block
      (6L, "betta corp")                         // different block from 5 under first-4 key
    ).toDF("id", "name")
    val got = EntityResolution.candidatePairs(
      recs, "id", "name", substring(col("name"), 1, 4), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // block 'alph' = {1,2,3,4}: pairs within distance 2 only; 'beta' vs
    // 'bett' never pair — blocking is the recall/cost knob
    assert(got == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
    // maxDist 0 keeps only the exact duplicate
    val exact = EntityResolution.candidatePairs(
      recs, "id", "name", substring(col("name"), 1, 4), maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
  }
}
