package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Partition-pruned parquet sink — the write-side half of the 100 TB layout
 * rules (the read-side half is [[Bucketing]]).
 *
 * Hive-style `partitionBy` directories give every downstream reader free
 * partition pruning (`WHERE lang = 'en'` never opens other directories —
 * the scan's `PartitionFilters` line, not a row filter). The two failure
 * modes this wrapper exists to prevent, both invisible at test scale and
 * fatal at 100 TB:
 *
 *   - **File explosion**: `df.write.partitionBy(p)` opens one file per
 *     hive-partition per shuffle task — N tasks × P partitions files
 *     (measured: 32 tasks × 40 partitions = 1,280 files for a 500-row
 *     table). The fix is a repartition ON the partition columns first, so
 *     each hive-partition's rows arrive at exactly one task →
 *     `filesPerPartition` files, default 1.
 *   - **Hot-partition straggler**: with one task per partition, a skewed
 *     partition (80% English in a web corpus) serializes on one core.
 *     `filesPerPartition > 1` adds a deterministic row-content hash to the
 *     repartition key, spreading each partition over that many tasks/files
 *     — the same salting device as [[graft.operators.SkewJoin]].
 *
 * `sortCols` sorts within each task before writing, so parquet min/max
 * column statistics become selective — readers filtering on a sort column
 * skip whole row groups. `maxRecordsPerFile` bounds any single file
 * regardless of skew.
 */
object Writer {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 1, sortCols: Seq[String] = Nil,
                       maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(filesPerPartition >= 1, s"filesPerPartition must be >= 1, got $filesPerPartition")
    val parts = partitionCols.map(col)
    val keyed =
      if (filesPerPartition > 1)
        df.repartition((parts :+
          graft.util.ContentSalt(df, filesPerPartition)): _*)
      else df.repartition(parts: _*)
    val arranged =
      if (sortCols.nonEmpty)
        keyed.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else keyed
    val writer = arranged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(path)
  }

  /** Read a layout written by [[writePartitioned]]. Partition-directory
    * values come back as columns (pruned when filtered on). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSONL (newline-delimited JSON) sink — the interchange format LLM data
    * pipelines actually exchange. Same file-count discipline as the parquet
    * sink: repartition to `numFiles` before writing so the directory holds
    * a bounded file set, gzip optional (JSONL's usual wire form). */
  def writeJsonl(df: DataFrame, path: String, numFiles: Int = 1,
                 gzip: Boolean = false): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val w = df.repartition(numFiles).write.mode(SaveMode.Overwrite)
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Read a JSONL directory with an EXPLICIT schema — schema inference over
    * 100 TB of JSONL is a full extra pass plus silent type drift (a column
    * that happens to look integral in the sampled files), so the reader
    * requires the contract up front. Column order follows the schema, not
    * the JSON key order. */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV sink (header, RFC-4180 quoting) — the lowest-common-denominator
    * interchange format. Same bounded-file-count discipline as the JSONL
    * sink. Embedded delimiters/quotes/newlines round-trip via quoting; use
    * parquet for binary or deeply nested columns. */
  def writeCsv(df: DataFrame, path: String, numFiles: Int = 1,
               gzip: Boolean = false): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val w = df.repartition(numFiles).write.mode(SaveMode.Overwrite)
      .option("header", "true")
      // Spark's CSV writer TRIMS cell whitespace by default — lossy; off
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  /** Read a CSV directory with an EXPLICIT schema — inference over CSV at
    * scale is an extra pass AND lossy (leading zeros, big integers, date
    * look-alikes silently retype), so the reader requires the contract up
    * front, same as [[readJsonl]]. An empty cell reads back NULL (CSV has
    * no empty-vs-NULL distinction). `multiLine` enables quoted embedded
    * newlines at the cost of file splittability (each file becomes one
    * task) — keep it off unless the data needs it; at scale prefer JSONL
    * or parquet for multi-line text. */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("multiLine", multiLine.toString).csv(path)

  /**
   * Compact a parquet directory's small files in place: rewrite the data
   * through the same layout discipline as [[writePartitioned]] (or a flat
   * `numFiles`-file layout when `partitionCols` is empty), then atomically
   * swap directories. Small-file buildup is the steady-state failure of any
   * streaming/incremental sink (one file per micro-batch per partition):
   * at 100 TB the NameNode/listing cost and per-file open overhead dominate
   * scan time long before the data does — compaction is the maintenance
   * pass that keeps reads scan-bound.
   *
   * The swap is rename-based: readers that listed files BEFORE the swap
   * keep reading the old inodes (POSIX) or fail-and-retry (object stores);
   * writers must be quiesced — this is a maintenance op, not a concurrent
   * merge (a table format's transaction log is the concurrent answer).
   */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String] = Nil,
              filesPerPartition: Int = 1, sortCols: Seq[String] = Nil): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    // depth-first delete; Files.list's stream must close (each open stream
    // holds a directory fd — a wide tree would otherwise exhaust handles)
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        val children = try s.iterator().asScala.toList finally s.close()
        children.foreach(rm)
      }
      Files.delete(p)
    }
    val tmp = path.stripSuffix("/") + ".__compacting"
    val oldP = Paths.get(path.stripSuffix("/") + ".__old")
    val liveP = Paths.get(path.stripSuffix("/"))
    // a previously crashed run may have left .__old / .__compacting behind;
    // either would make the ATOMIC_MOVE swap below fail. But a crash BETWEEN
    // the two moves (path→.__old done, tmp→path not) leaves .__old as the
    // ONLY copy of the data — deleting it first would be unrecoverable
    // data loss. Restore before cleaning: if the live path is missing and
    // .__old exists, move it back; only delete leftovers once the live
    // directory is verifiably present.
    if (!Files.exists(liveP) && Files.exists(oldP))
      Files.move(oldP, liveP, StandardCopyOption.ATOMIC_MOVE)
    require(Files.exists(liveP),
      s"compact: live path $path missing and no .__old backup to restore")
    if (Files.exists(oldP)) rm(oldP)
    if (Files.exists(Paths.get(tmp))) rm(Paths.get(tmp))
    val df = spark.read.parquet(path)
    if (partitionCols.isEmpty) {
      val flat = if (sortCols.nonEmpty)
        df.repartition(filesPerPartition).sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(filesPerPartition)
      flat.write.mode(SaveMode.Overwrite).parquet(tmp)
    } else writePartitioned(df, tmp, partitionCols, filesPerPartition, sortCols)
    Files.move(Paths.get(path), oldP, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    rm(oldP)
  }
}
