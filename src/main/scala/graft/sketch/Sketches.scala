package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Deterministic cardinality sketches for corpus-scale statistics — the
 * 100 TB answer to "how many distinct X per group" when exact
 * count(DISTINCT) would shuffle every value: bounded state, map-side
 * partial aggregation, associative merge. Deterministic by construction
 * (md5 is the random oracle), so unlike HLL the estimate is
 * engine-reproducible and the external DuckDB oracle computes the exact
 * same number (beyond the reference, which has no sketch surface).
 */
object Sketches {

  /** 16^15 = 2^60 — the hash-prefix value space (first 15 hex chars of the
    * md5; 15 keeps the parse inside a signed 64-bit int). Exact as a
    * Double (power of two). */
  val HashSpace: Double = 1152921504606846976.0

  /**
   * K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002): keep
   * the k smallest DISTINCT md5 hashes seen; if fewer than k survive the
   * stream, the count is exact; otherwise the k-th smallest hash h_(k)
   * estimates the cardinality as (k−1) / (h_(k) / 2^60) — the k-th order
   * statistic of n uniform draws sits at ≈ k/n of the space.
   *
   * The buffer is a sorted ascending Vector of ≤ k hex strings — O(k)
   * state per group regardless of input size, reduced per-partition
   * (map-side combine) and merged associatively, which is exactly the
   * shape that survives a 1000-executor aggregation. Spark's built-in
   * approx_count_distinct (HLL) is the production default; this sketch is
   * the DETERMINISTIC sibling for pipelines that need reproducible,
   * engine-portable estimates.
   */
  final class KmvAggregator(k: Int) extends Aggregator[String, Vector[String], (Long, String)] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def zero: Vector[String] = Vector.empty
    def reduce(b: Vector[String], h: String): Vector[String] = insert(b, h)
    def merge(a: Vector[String], b: Vector[String]): Vector[String] = b.foldLeft(a)(insert)
    /** (#hashes in sketch, k-th smallest hash or "" when under-full). */
    def finish(b: Vector[String]): (Long, String) =
      (b.size.toLong, if (b.size < k) "" else b.last)
    private def insert(b: Vector[String], h: String): Vector[String] = {
      if (h == null) return b
      val i = searchInsert(b, h)
      if (i < b.size && b(i) == h) b // duplicate value: a set, not a bag
      else if (b.size < k) b.patch(i, Seq(h), 0)
      else if (i >= k) b // larger than the current k-th minimum
      else b.patch(i, Seq(h), 0).take(k)
    }
    private def searchInsert(b: Vector[String], h: String): Int = {
      var lo = 0; var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
    def bufferEncoder: Encoder[Vector[String]] = ExpressionEncoder()
    def outputEncoder: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  }

  /**
   * Per-group distinct-count estimate of `value` via a k-minimum-values
   * sketch: one hash projection + one partial-aggregating groupBy — no
   * count(DISTINCT) shuffle of the full value set.
   *
   * @return (groupCol, est DOUBLE) — exact when the group has < k distinct
   *         values, rounded to 6 decimals (the oracle-compare contract)
   */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    val sketch = udaf(new KmvAggregator(k), Encoders.STRING)
    df.select(col(groupCol), md5(value.cast("string").cast("binary")).as("__h"))
      .groupBy(groupCol)
      .agg(sketch(col("__h")).as("__sk"))
      .select(col(groupCol),
        round(
          when(col("__sk._1") < k, col("__sk._1").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
              conv(substring(col("__sk._2"), 1, 15), 16, 10).cast("long").cast("double")),
          6).as("est"))
  }
}
