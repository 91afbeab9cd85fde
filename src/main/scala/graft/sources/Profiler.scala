package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-pass column profiling — the data-quality gate every ingest pipeline
 * runs before training jobs consume a table (beyond the reference, which
 * profiles nothing): per column, row/null/distinct counts and min/max.
 *
 * Plan shape: ONE aggregation over the table (the multi-count-distinct
 * compiles to Spark's single Expand + partial-agg pass — k columns
 * multiply rows inside the shuffle, not table scans), then the 1-row
 * result explodes into the long (column, metrics) layout. No per-column
 * rescans; at 100 TB this is exactly one read of the data. For
 * cardinalities where exact count(DISTINCT) is unaffordable, swap in the
 * KMV sketch ([[graft.sketch.Sketches.kmvDistinct]]) per column.
 */
object Profiler {

  /** @return one row per profiled column:
    *         (column, n_rows, n_nulls, n_distinct, min_value STRING,
    *         max_value STRING) — min/max stringified so mixed-type
    *         profiles share one schema */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"), // non-null count
      countDistinct(col(c)).as(s"__dst_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stacked = cols.map(c =>
      struct(lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value")))
    row.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /**
   * The 100 TB profiler: [[profile]]'s exact multi-`count(DISTINCT)` is one
   * Expand pass whose shuffle carries every distinct VALUE of every column
   * — unaffordable on high-cardinality columns at scale. This variant
   * estimates NDV per column from HyperLogLog register tables instead
   * (state = cols × 2^p rows, independent of cardinality) and keeps the
   * exact cheap stats (rows/nulls/min/max — plain combinable aggregates)
   * from a second thin pass. NDV is over the STRINGIFIED value (the
   * sketch's hash contract); deterministic md5, so externally replayable.
   *
   * @return (column, n_rows, n_nulls, ndv_est DOUBLE, min_value, max_value)
   */
  def profileSketch(df: DataFrame, cols: Seq[String], p: Int = 12): DataFrame = {
    require(cols.nonEmpty, "profileSketch needs at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("__v"))): _*)).as("s"))
      .select("s.*")
    val ndv = graft.sketch.Sketches.hllDistinct(stacked, Seq("column"), col("__v"), p)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stats = row.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col("__rows").as("n_rows"),
          (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__min_$c").as("min_value"),
          col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
    stats.join(ndv.select(col("column"), col("est").as("ndv_est")), Seq("column"))
      .select("column", "n_rows", "n_nulls", "ndv_est", "min_value", "max_value")
  }
}
