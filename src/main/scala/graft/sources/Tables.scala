package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/**
 * Readers for the driver's parquet tables (TESTDATA.md).
 *
 * `events.parquet` has shipped with two different `ts` physical types across
 * driver generations: TIMESTAMP(NANOS) (which Spark's parquet reader only
 * accepts as a raw long via the legacy nanos-as-long conf) and native
 * TIMESTAMP_NTZ(us). The loader is schema-adaptive: it inspects the column's
 * resolved type and only applies the nanos→micros truncation (integer DIV —
 * matching DuckDB's own truncation, so oracle timestamps agree exactly) when
 * the column actually arrived as a long.
 */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events frame so `ts` is always TimestampType, whatever the
    * fixture's physical encoding. Shared by the batch and streaming readers.
    *
    * SESSION-TIMEZONE CONTRACT: the two encodings agree only under a UTC
    * session (`spark.sql.session.timeZone=UTC`, which Verify, Bench, and the
    * test harness all pin). Legacy nanos are epoch INSTANTS (UTC wall =
    * naive value); a native TIMESTAMP_NTZ casts through the SESSION zone
    * (rendered wall = naive value). Under any non-UTC session one of the
    * two renders shifted — also shifting window/date results against the
    * naive-timestamp DuckDB oracle. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // legacy fixture: nanos read as raw long
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => // current fixture: native TIMESTAMP_NTZ(us)
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already TimestampType
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Harmless when the fixture carries a native timestamp; required to even
    // read the legacy TIMESTAMP(NANOS) encoding.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, dir, "events"))
  }
}
