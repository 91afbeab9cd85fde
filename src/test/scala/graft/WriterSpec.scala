package graft

import graft.sources.Writer
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Writer's layout contract: hive partition dirs, bounded file counts,
  * in-file sort for row-group statistics, lossless round trip. */
class WriterSpec extends SparkSpec {

  private def leafDirs(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala.filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.contains("=") &&
        Files.list(p).iterator().asScala.exists(f =>
          f.getFileName.toString.endsWith(".parquet"))).toSeq

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq

  private lazy val docs = spark.read.parquet(s"$SF/documents.parquet")

  test("one file per partition by default; round trip is lossless") {
    val root = Files.createTempDirectory("graft-writer")
    Writer.writePartitioned(docs, root.toString, Seq("lang", "source"))
    val leaves = leafDirs(root)
    assert(leaves.nonEmpty, "expected hive-style lang=/source= directories")
    assert(leaves.forall(d => parquetFiles(d).size == 1),
      "default layout must write exactly one file per hive-partition")
    val back = Writer.readPartitioned(spark, root.toString)
      .select(docs.columns.map(col): _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("filesPerPartition spreads a partition over bounded files; maxRecordsPerFile caps rows") {
    val root = Files.createTempDirectory("graft-writer-split")
    Writer.writePartitioned(docs, root.toString, Seq("lang"),
      filesPerPartition = 3, maxRecordsPerFile = 40)
    val leaves = leafDirs(root)
    assert(leaves.nonEmpty)
    leaves.foreach { d =>
      val files = parquetFiles(d)
      // 3 salt tasks, each further split by the 40-record cap
      assert(files.nonEmpty)
      files.foreach { f =>
        val n = spark.read.parquet(f.toString).count()
        assert(n <= 40, s"file $f has $n rows > maxRecordsPerFile")
      }
    }
    val back = Writer.readPartitioned(spark, root.toString)
      .select(docs.columns.map(col): _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("sortCols orders rows inside each file (selective row-group stats)") {
    val root = Files.createTempDirectory("graft-writer-sorted")
    Writer.writePartitioned(docs, root.toString, Seq("lang"), sortCols = Seq("doc_id"))
    leafDirs(root).foreach { d =>
      parquetFiles(d).foreach { f =>
        val ids = spark.read.parquet(f.toString).select("doc_id")
          .as[Long](spark.implicits.newLongEncoder).collect()
        assert(ids.sameElements(ids.sorted), s"file $f is not sorted by doc_id")
      }
    }
  }

  test("reads with a partition filter prune to the matching directory") {
    val root = Files.createTempDirectory("graft-writer-prune")
    Writer.writePartitioned(docs, root.toString, Seq("lang"))
    val one = Writer.readPartitioned(spark, root.toString).filter(col("lang") === "en")
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected a partition filter on lang in the scan:\n$scan")
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }

  test("jsonl: bounded file count, lossless round trip under the explicit schema") {
    import java.nio.file.Files
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val root = Files.createTempDirectory("graft-jsonl").toString
    Writer.writeJsonl(docs, root, numFiles = 3)
    val files = new java.io.File(root).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val back = Writer.readJsonl(spark, root, docs.schema)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("csv: adversarial strings (commas, quotes, newlines, empty) round-trip via quoting") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak"),
      (5L, ""),
      (6L, "trailing space "),
      (7L, "unicode — ü 中"))
      .toDF("id", "s")
    val root = Files.createTempDirectory("graft-csv").toString
    Writer.writeCsv(rows, root, numFiles = 2)
    val files = new java.io.File(root).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 2, files.map(_.getName).mkString(","))
    val back = Writer.readCsv(spark, root, rows.schema, multiLine = true)
    // file sources surface every column nullable; compare names/types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      rows.schema.map(f => (f.name, f.dataType)))
    // CSV has no empty-vs-NULL distinction without an explicit marker; the
    // empty string reads back as NULL — assert the documented contract
    val expected = rows.withColumn("s", when(col("s") === "", lit(null)).otherwise(col("s")))
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
  }

  test("compact: 40-file spray → one file per partition, rows identical, old dir gone") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val root = Files.createTempDirectory("graft-compact")
    Files.delete(root)
    docs.repartition(40).write.parquet(root.toString)
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    assert(parquetFiles(new java.io.File(root.toString)).size == 40)
    Writer.compact(spark, root.toString, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"))
    val files = parquetFiles(new java.io.File(root.toString))
    val nLangs = docs.select("lang").distinct().count()
    assert(files.size == nLangs, s"expected $nLangs files, got ${files.size}")
    val back = Writer.readPartitioned(spark, root.toString)
      .select("doc_id", "lang", "source", "n_chars")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // no leftover work dirs
    val siblings = new java.io.File(root.toString).getParentFile.listFiles()
      .map(_.getName).filter(_.startsWith(root.getFileName.toString + "."))
    assert(siblings.isEmpty, siblings.mkString(","))
  }

  test("profiler: nulls, distincts, stringified min/max, one row per column") {
    import spark.implicits._
    val d = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("k", "v")
    val got = graft.sources.Profiler.profile(d, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("k") == (4L, 0L, 4L, "1", "4"))
    assert(got("v") == (4L, 1L, 2L, "a", "b")) // count(DISTINCT) skips NULL
  }
}
