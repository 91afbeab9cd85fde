package graft

import graft.graph.PropertyGraph
import graft.operators.PatternExec
import graft.plans._

/**
 * Branch-merge semantics: ports the reference's GrBTuples row-join golden
 * vectors (g4s-matrix-graph/src/test/scala/.../traverser/GrBTuplesSpec.scala:110-243)
 * through the logical `Join` node — the reference's host-side
 * rowInnerMergeJoin / rowJoinOnBinarySearch become Spark's own join
 * execution, so the vectors assert the SAME duplicate-key multiplicity:
 * one output row per matching combination.
 *
 * Also pins the multigraph contract: with parallel (duplicate) edges the
 * intermediate rows multiply, but the query surface keeps set semantics —
 * the engine knows the fixture graph cannot guarantee distinct edges
 * (edgesDistinct = false) and pays the final duplicate elimination.
 */
class JoinSpec extends SparkSpec {

  private def graph(nodes: Seq[Long], edges: Seq[(Long, Long, String)]): PropertyGraph =
    PropertyGraph.fromTuples(spark, nodes.map(_ -> "N"), edges)

  /** Two one-hop branches from a shared binding m, merged on m. */
  private def joined(g: PropertyGraph): Set[(Long, Long, Long)] = {
    val left = Expand(GetNodes("m", None), "m", GetEdges(Seq("L"), transpose = false), "x",
      None, Set("m", "x"))
    val right = Expand(GetNodes("m", None), "m", GetEdges(Seq("R"), transpose = false), "y",
      None, Set("m", "y"))
    val plan = Join(left, right, "m", Set("m", "x", "y"))
    PatternExec.compile(plan, g).select("m", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("join merge: empty sides and non-matching keys produce nothing") {
    assert(joined(graph(Seq(1, 2), Seq.empty)) == Set.empty)
    assert(joined(graph(Seq(1, 2, 3, 4),
      Seq((1L, 3L, "L"), (2L, 4L, "R")))) == Set.empty) // keys 1 vs 2: no match
  }

  test("join merge: single matching key emits one combined row") {
    // ref: left (1,0), right (1,2) → [1, 0, 2]
    assert(joined(graph(Seq(0, 1, 2), Seq((1L, 0L, "L"), (1L, 2L, "R")))) ==
      Set((1L, 0L, 2L)))
  }

  test("join merge: unmatched rows drop, matched pass (first/second out)") {
    // ref: left (1,0) (5,3); right (1,2) → [1,0,2]
    assert(joined(graph(Seq(0, 1, 2, 3, 5),
      Seq((1L, 0L, "L"), (5L, 3L, "L"), (1L, 2L, "R")))) == Set((1L, 0L, 2L)))
    // ref: right (5,2) → [5,3,2]
    assert(joined(graph(Seq(0, 1, 2, 3, 5),
      Seq((1L, 0L, "L"), (5L, 3L, "L"), (5L, 2L, "R")))) == Set((5L, 3L, 2L)))
  }

  test("join merge: duplicate keys multiply (one row per combination)") {
    // ref: left (2,0) (4,3) (3,1); right (2,7) (2,8) (4,9)
    //   → [2,0,7] [2,0,8] [4,3,9]
    assert(joined(graph(Seq(0, 1, 2, 3, 4, 7, 8, 9),
      Seq((2L, 0L, "L"), (4L, 3L, "L"), (3L, 1L, "L"),
          (2L, 7L, "R"), (2L, 8L, "R"), (4L, 9L, "R")))) ==
      Set((2L, 0L, 7L), (2L, 0L, 8L), (4L, 3L, 9L)))
  }

  test("join merge: 7-way duplicate expansion (index-join vector)") {
    // ref index join: left rows (0→4) (1→2) (3→3); right (2→1..6) (4→7)
    //   → 7 rows: (0,4,7), (1,2,1..6); (3,3) unmatched
    val rights = (1L to 6L).map(v => (2L, v, "R")) :+ (4L, 7L, "R")
    val expected = Set((0L, 4L, 7L)) ++ (1L to 6L).map(v => (1L, 2L, v))
    // here the shared binding is the MIDDLE: x -L-> m, m -R-> y; join on m
    val g = graph(0L to 9L, Seq((0L, 4L, "L"), (1L, 2L, "L"), (3L, 3L, "L")) ++ rights)
    val left = Expand(GetNodes("x", None), "x", GetEdges(Seq("L"), transpose = false), "m",
      None, Set("x", "m"))
    val right = Expand(GetNodes("m", None), "m", GetEdges(Seq("R"), transpose = false), "y",
      None, Set("m", "y"))
    val plan = Join(left, right, "m", Set("x", "m", "y"))
    val got = PatternExec.compile(plan, g).select("x", "m", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("parallel edges: intermediate rows multiply, query keeps set semantics") {
    import org.apache.spark.sql.functions.col
    // true duplicate edge rows (same src, dst, etype) — a multigraph load
    val nodes = Seq(1L -> "A", 2L -> "B", 3L -> "B")
    val edges = Seq((1L, 2L, "E"), (1L, 2L, "E"), (1L, 3L, "E"))
    val g = PropertyGraph.fromTuples(spark, nodes, edges)
    assert(!g.edgesDistinct)
    // raw compiled Expand keeps the duplicate (keep == available → no dedup)
    val raw = PatternExec.compileTracked(
      Expand(GetNodes("a", Some("A")), "a", GetEdges(Seq("E"), transpose = false), "b",
        None, Set("a", "b")), g)
    assert(!raw.distinct)
    assert(raw.df.count() == 3) // (1,2) twice + (1,3)
    // ...but the query surface is set-semantic: final dedup still applied
    val db = new GraphDB(g)
    val rows = db.query("MATCH (a:A)-[:E]->(b:B) RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 2 && rows.toSet == Set((1L, 2L), (1L, 3L)))
  }

  test("distinct-edged graph skips the final dedup; multigraph does not") {
    val nodes = Seq(1L -> "A", 2L -> "B")
    val edges = Seq((1L, 2L, "E"))
    val multi = PropertyGraph.fromTuples(spark, nodes, edges)
    val dedup = multi.copy(edgesDistinct = true)
    // assert on the ANALYZED plan — what OUR layer emits. (On the optimized
    // plan Catalyst may legitimately elide the Deduplicate again via
    // distinct-key inference, e.g. over tiny LocalRelations.)
    def analyzed(g: PropertyGraph): String =
      new GraphDB(g).query("MATCH (a:A)-[:E]->(b:B) RETURN a, b")
        .queryExecution.analyzed.toString()
    assert(analyzed(multi).contains("Deduplicate"))
    assert(!analyzed(dedup).contains("Deduplicate"))
  }
}
