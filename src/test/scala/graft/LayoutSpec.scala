package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton code bit-exactness (vs a Scala reference
  * interleave), and the write path's pruning-enabling property — files
  * cover pairwise DISJOINT z ranges. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(k => (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1)))
      .reduce(_ | _)

  test("zValue matches the reference interleave on goldens and a sweep") {
    val rows = Seq((5L, 3L), (0L, 0L), (1023L, 0L), (0L, 1023L), (731L, 498L)) ++
      (0 until 200).map(i => ((i * 37 % 1024).toLong, (i * 91 % 1024).toLong))
    val got = rows.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == zRef(x, y, 10), s"($x,$y)") }
    // the classic golden: interleave(5=101b, 3=011b) = 011011b = 27
    assert(zRef(5, 3, 3) == 27)
  }

  test("zValue masks to the requested bit width") {
    val z = Seq((1024L + 5L, 2048L + 3L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 10)).as[Long].head()
    assert(z == zRef(5, 3, 10)) // high bits beyond `bits` never leak in
  }

  test("writeZOrdered: round trip, file count, and disjoint per-file z ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val df = spark.read.parquet(s"$SF/orders.parquet")
      .select($"o_orderkey", ($"o_custkey" % 256).as("x"), ($"o_orderkey" % 256).as("y"))
    Layout.writeZOrdered(df, out, "x", "y", bits = 8, numFiles = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    assert(back.columns.sorted.sameElements(df.columns.sorted))
    // recompute z per file: range partitioning ⇒ non-overlapping [min, max]
    val ranges = back
      .withColumn("f", input_file_name())
      .withColumn("z", Layout.zValue($"x", $"y", 8))
      .groupBy("f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ =>
    }
  }
}
