package graft

import org.apache.spark.sql.functions._
import graft.algorithms.Algorithms
import graft.text.TextOps

/** Degenerate-input contracts: empty edge sets, all-OOV vocabularies,
  * groups smaller than their quota — the shapes a library gets handed in
  * production that a benchmark never exercises. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("Tables.events is schema-adaptive: legacy nanos-as-long and native timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_fixture").toString
    // legacy driver generations wrote TIMESTAMP(NANOS), which Spark reads as
    // a raw long under the nanosAsLong conf; synthesize that shape directly
    val nanos = 1704067200L * 1000000000L + 123456789L // 2024-01-01T00:00:00.123456789
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = graft.sources.Tables.events(spark, dir)
    assert(legacy.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // nanos truncate (integer DIV) to micros — matching DuckDB's truncation
    val got = legacy.select(col("ts").cast("string")).as[String].head()
    assert(got == "2024-01-01 00:00:00.123456")
    // the native path: current fixtures carry TIMESTAMP_NTZ(us)
    val native = graft.sources.Tables.events(spark, SF)
    assert(native.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(native.limit(1).count() == 1)
  }

  test("connectedComponents: no edges — every vertex is its own component") {
    val vs = Seq(1L, 2L, 3L).toDF("id")
    val es = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Algorithms.connectedComponents(vs, es)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("connectedComponents: self-loops only — still singletons") {
    val vs = Seq(1L, 2L).toDF("id")
    val es = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    val got = Algorithms.connectedComponents(vs, es)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("bfs: sources with no out-edges terminate at level 0") {
    val es = Seq((10L, 20L)).toDF("src", "dst")
    val got = Algorithms.bfs(es, Seq(99L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(99L -> 0))
  }

  test("sssp: unreachable vertices are absent, sources at 0") {
    val es = Seq((1L, 2L, 5.0)).toDF("src", "dst", "w")
    val got = Algorithms.sssp(es, Seq(1L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 5.0))
  }

  test("encodeDocs: vocab larger than distinct tokens — nothing is OOV") {
    val d = Seq((1L, "x y")).toDF("doc_id", "text")
    val got = TextOps.encodeDocs(d, "doc_id", "text", 100)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(got == Map("x" -> 1L, "y" -> 2L)) // count tie → token-asc order
  }

  test("quotaPerGroup: groups under quota keep all rows") {
    val d = Seq(("g", 1L), ("g", 2L)).toDF("src", "id")
    assert(TextOps.quotaPerGroup(d, "src", 10, $"id".asc).count() == 2L)
  }

  test("dedupClusters: empty pair set — every doc keeps itself") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = TextOps.dedupClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true)))
  }
}
