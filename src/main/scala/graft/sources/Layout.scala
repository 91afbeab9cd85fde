package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-order (Morton) clustering for scan
 * pruning. No reference analogue (the reference holds everything in
 * memory); at 100 TB the layout IS the index — parquet min/max footers on
 * a Z-ordered file set prune selective scans on EITHER interleaved
 * dimension, where a single-column sort only prunes its leading column.
 */
object Layout {

  /** Morton code of two non-negative integer columns: bit k of `x` lands
    * at position 2k, bit k of `y` at 2k+1, for the low `bits` bits of
    * each (values are masked to `bits` bits, so callers quantize first).
    * Pure bit arithmetic — codegen'd, engine-reproducible. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue needs 1 <= bits <= 31, got $bits")
    (0 until bits).map { k =>
      shiftleft(shiftright(x.cast("long"), k).bitwiseAND(1), 2 * k)
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), k).bitwiseAND(1), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /**
   * Write `df` as `numFiles` parquet files Z-ordered on (xCol, yCol):
   * range-partition by the Morton code (non-overlapping z-ranges per file
   * — each file is a contiguous run of quadrants, so its x AND y min/max
   * footers are tight), sort within each file, drop the helper column.
   * The range boundaries come from Spark's reservoir sample of the z
   * distribution — skewed (x, y) densities still give balanced files.
   */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
