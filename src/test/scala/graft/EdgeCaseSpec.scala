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

  test("value expressions propagate NULL (Cypher ternary), filters drop non-true") {
    val g = graph.PropertyGraph(
      spark.createDataFrame(Seq(
        (1L, "A", Option(2.0)), (2L, "A", Option.empty[Double]), (3L, "A", Option(5.0))))
        .toDF("id", "label", "v"),
      spark.createDataFrame(Seq((1L, 2L, "X"))).toDF("src", "dst", "etype"))
    val db = new GraphDB(g)
    // projection: null operand -> null result row is KEPT (it is a value,
    // not a filter)
    val proj = db.query("MATCH (a:A) RETURN a, a.v * 2 AS d ORDER BY a")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(proj.toSeq == Seq((1L, Some(4.0)), (2L, None), (3L, Some(10.0))))
    // WHERE: null comparison is not true -> row dropped; NOT(null) stays null
    val w = db.query("MATCH (a:A) WHERE a.v + 1 > 0 RETURN a ORDER BY a")
      .collect().map(_.getLong(0))
    assert(w.toSeq == Seq(1L, 3L))
    val notW = db.query("MATCH (a:A) WHERE NOT (a.v + 1 > 0) RETURN a")
      .collect().map(_.getLong(0))
    assert(notW.isEmpty)
    // CASE: a null-valued WHEN condition is not taken; ELSE catches it
    val cased = db.query(
      "MATCH (a:A) RETURN a, CASE WHEN a.v > 0 THEN 'pos' ELSE 'other' END AS k ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(cased.toSeq == Seq((1L, "pos"), (2L, "other"), (3L, "pos")))
    // coalesce over the null expression result
    val co = db.query("MATCH (a:A) RETURN a, coalesce(a.v * 2, -1) AS d ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(co.toSeq == Seq((1L, 4.0), (2L, -1.0), (3L, 10.0)))
    // division by zero fails LOUDLY (Spark ANSI; Neo4j also errors on
    // integer /0) — consistent with the engine's loud-error philosophy
    val dz = intercept[Exception] {
      db.query("MATCH (a:A) RETURN a, a.v / 0 AS q").collect()
    }
    assert(dz.getMessage.contains("DIVIDE_BY_ZERO"))
    // aggregates skip null expression values (sum over {4, null, 10})
    val s = db.query("MATCH (a:A) RETURN sum(a.v * 2) AS s")
      .collect().map(_.getDouble(0))
    assert(s.toSeq == Seq(14.0))
  }

  test("write surface edge cases: zero-match writes, params, empty graphs") {
    import spark.implicits._
    val g = graft.graph.PropertyGraph(
      Seq((1L, "A", "a1"), (2L, "B", "b1")).toDF("id", "label", "name"),
      Seq((1L, 2L, "X")).toDF("src", "dst", "etype"))
    val db = new GraphDB(g)
    // zero-match SET / DELETE / edge-CREATE are clean no-ops, not errors
    val s0 = db.execute("MATCH (b:B) WHERE b.name = 'nope' SET b.name = 'x'")
    assert(s0.graph.nodes.collect().map(_.getString(2)).sorted.toSeq == Seq("a1", "b1"))
    val d0 = db.execute("MATCH (a:A)-[r:NOPE]->(b:B) DELETE r")
    assert(d0.graph.edges.count() == 1)
    val c0 = db.execute("MATCH (a:A), (b:B) WHERE a.name = 'nope' CREATE (a)-[:Y]->(b)")
    assert(c0.graph.edges.count() == 1)
    assert(c0.stats == db.stats) // incremental delta of an empty pair set
    // $params flow into CREATE property maps
    val p = db.execute("CREATE (c:C {id: $cid, name: $nm})",
      Map("cid" -> 77L, "nm" -> "seven"))
    assert(p.query("MATCH (c:C) RETURN c, c.name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((77L, "seven")))
    // DETACH DELETE everything, then CREATE into the emptied graph:
    // id allocation survives an empty node table (max(id) over zero rows)
    val emptied = db.execute("MATCH (a:A) DETACH DELETE a")
      .execute("MATCH (b:B) DETACH DELETE b")
    assert(emptied.graph.nodes.count() == 0 && emptied.graph.edges.count() == 0)
    val reborn = emptied.execute("CREATE (z:Z {name: 'first'})")
    assert(reborn.query("MATCH (z:Z) RETURN z").collect().map(_.getLong(0)).toSeq == Seq(0L))
    // MERGE against a multigraph edge table (duplicate stored rows) adds
    // nothing when the key exists, regardless of multiplicity
    val multi = new GraphDB(graft.graph.PropertyGraph(
      Seq((1L, "A", "a1"), (2L, "B", "b1")).toDF("id", "label", "name"),
      Seq((1L, 2L, "X"), (1L, 2L, "X")).toDF("src", "dst", "etype")))
    val m1 = multi.execute("MATCH (a:A), (b:B) MERGE (a)-[:X]->(b)")
    assert(m1.graph.edges.count() == 2) // both stored rows kept, none added
    // a read-query text is not a write statement — loud parse error
    intercept[graft.cypher.ParseException] {
      db.execute("MATCH (a:A) RETURN a")
    }
  }
}
