package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Bucketed-table layout for co-located joins — the storage-side half of the
 * 100 TB design rules (README "Scale posture"): a fact table written with
 * `bucketBy(n, key) + sortBy(key)` is hash-partitioned ON DISK, so every
 * subsequent equi-join or aggregation on that key skips its exchange (and
 * with sorted buckets, the sort) entirely. For a graph workload this is the
 * difference between shuffling the edge table once per query and never:
 * bucket `edges` by `src` (and a transpose copy by `dst`, mirroring the
 * reference's eagerly-maintained transpose matrices,
 * ConcurrentDirectedGraph.scala:146-148) at load time, then every Expand
 * join probes co-located buckets.
 *
 * Spark-native notes: bucket metadata lives in the session catalog
 * (`saveAsTable` — works with the default in-memory catalog; a production
 * deployment points it at its metastore), and bucket-join elision requires
 * equal bucket counts on both sides or a multiple under
 * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`.
 */
object Bucketing {

  /** Write `df` as a bucketed + sorted parquet table registered as
    * `tableName` at `path`. Overwrites. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    buckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(tableName)
  }

  /** The bucketed table as a DataFrame (bucket metadata attached — joins
    * and aggregations on the bucket keys read co-located, pre-sorted
    * buckets with no exchange). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
