package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The −0.0 hash-flake guard (CORRECTNESS_r11's only red row): Spark's
 * round() yields +0.0 where DuckDB's yields −0.0 — equal values,
 * different bytes, so the driver's byte-hash gate stays red. The fix is
 * double-sided canonicalization ([[graft.util.NegZero]]): Verify adds
 * `+ 0.0` to every double output column, oracleSql wraps each query in
 * `* REPLACE (CAST(c + 0 AS DOUBLE) AS c)`. Both sides key off the
 * GENERATED [[NegZeroCols]] map — this spec re-derives that map from
 * the live query schemas so it can never go stale silently.
 */
class NegZeroAuditSpec extends SparkSpec {

  test("NegZeroCols matches every query's live double-output columns") {
    val stale = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, SF).schema
      val live = schema.fields.collect { case StructField(n, DoubleType, _, _) => n }.toSeq
      val recorded = NegZeroCols.cols.getOrElse(name, Seq.empty)
      if (live.sorted != recorded.sorted)
        Some(s"$name: live=${live.mkString(",")} recorded=${recorded.mkString(",")}")
      else None
    }
    assert(stale.isEmpty,
      "NegZeroCols.scala is stale — rerun Verify at sf0.001 + tools/gen_negzero_cols.py:\n" +
        stale.mkString("\n"))
  }

  test("no query emits float32 / float-array / float-struct outputs (wrap covers top-level doubles only)") {
    def floatsBelow(dt: DataType): Boolean = dt match {
      case FloatType => true
      case DoubleType => true
      case ArrayType(et, _) => floatsBelow(et)
      case StructType(fs) => fs.exists(f => floatsBelow(f.dataType))
      case MapType(k, v, _) => floatsBelow(k) || floatsBelow(v)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, SF).schema.fields.collect {
        case f if f.dataType != DoubleType && floatsBelow(f.dataType) => s"$name.${f.name}"
      }
    }
    assert(offenders.isEmpty,
      s"non-top-level-double float outputs need NegZero.wrapOracle extended: ${offenders.mkString(", ")}")
  }

  test("every oracle with recorded double columns is wrapped; others untouched") {
    val oracles = SparkEntry.oracleSql
    for ((name, sql) <- oracles) {
      val dcols = NegZeroCols.cols.getOrElse(name, Seq.empty)
      if (dcols.nonEmpty) {
        assert(sql.startsWith("SELECT * REPLACE ("), s"$name oracle not wrapped")
        dcols.foreach(c => assert(sql.contains(s"""CAST("$c" + 0 AS DOUBLE) AS "$c""""),
          s"$name oracle wrap missing column $c"))
      } else assert(!sql.contains("__negzero"), s"$name oracle wrapped without double cols")
    }
  }

  test("NegZero.normalize canonicalizes -0.0 and preserves null/NaN/values") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, -0.0, "a"), Row(2L, 0.0, "b"), Row(3L, Double.NaN, "c"),
        Row(4L, null, "d"), Row(5L, -1.25, "e"))),
      StructType(Seq(StructField("id", LongType), StructField("x", DoubleType),
        StructField("s", StringType))))
    val out = graft.util.NegZero.normalize(df).orderBy("id")
      .collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1))
    assert(java.lang.Double.doubleToRawLongBits(out(0).asInstanceOf[Double]) ==
      java.lang.Double.doubleToRawLongBits(0.0), "-0.0 must canonicalize to +0.0")
    assert(out(1) == 0.0 && out(2).asInstanceOf[Double].isNaN && out(3) == null
      && out(4) == -1.25)
    // schema and non-double columns untouched
    assert(graft.util.NegZero.normalize(df).schema == df.schema)
  }
}
