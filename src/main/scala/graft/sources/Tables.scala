package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Readers for the driver's parquet tables (TESTDATA.md).
 *
 * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
 * rejects by default; we flip the legacy nanos-as-long conf at runtime and
 * truncate to microseconds (integer DIV — matching DuckDB's own
 * nanos→micros truncation, so oracle timestamps agree exactly).
 */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
