package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphStats
import graft.plans._
import graft.plans.Pattern.{PatternEdge, PatternGraph}

/**
 * Golden plan tests: the stats-driven planner must FLIP its join order when
 * label statistics flip — ports of the reference's four OptimSpec scenarios
 * (g4s-matrix-graph/src/test/scala/.../optim/OptimSpec.scala:18-262), which
 * assert exact physical plans under skewed data. `Planner.plan` is pure
 * (stats in, LogicNode out), so these run without a SparkSession.
 *
 * Mapping of the reference's plan shapes to ours:
 *  - `A * (X*B)` (push the selective node filter onto the edge matrix,
 *    FilterExpandCommutative) ⇔ `Expand(..., toLabelPushed = Some(label))`
 *  - `(A*X) * B` (filter after the expand)   ⇔ `Filter(Expand(...), label)`
 *  - transposed second branch (walking against the arrow) ⇔
 *    `GetEdges(transpose = true)`
 *  - which operand is the frontier (association order) ⇔ the start binding.
 */
class PlannerSpec extends AnyFunSuite {

  private def pg(edges: Vector[PatternEdge], labels: Map[String, Option[String]],
                 returns: Seq[String]): PatternGraph =
    PatternGraph(labels, edges, Seq.empty, returns.map(b => graft.cypher.Ast.Ret(b)),
      distinct = false, orderBy = Seq.empty, limit = None)

  private def stats(nodes: Map[String, Long], edges: Map[String, Long],
                    triplets: Map[(String, String, String), Long]): GraphStats =
    GraphStats(nodes.values.sum, edges.values.sum, nodes, edges, triplets)

  private val oneHop = pg(
    Vector(PatternEdge("a", "b", Seq("X"), undirected = false)),
    Map("a" -> Some("A"), "b" -> Some("B")),
    returns = Seq("b"))

  // OptimSpec scenario 1: 5 A's, 1 B (and 4 D's) — B highly selective →
  // the reference picks A * (X * B): the B constraint is applied BEFORE the
  // expansion. Our planner expresses the same choice by starting the
  // traversal at b and pushing the A label onto the (transposed) edge scan.
  test("one-hop: selective B flips the plan to start at b (ref A * (X*B))") {
    val s = stats(
      nodes = Map("A" -> 5, "B" -> 1, "D" -> 4),
      edges = Map("X" -> 5),
      triplets = Map(("A", "X", "B") -> 1L, ("A", "X", "D") -> 4L))
    val plan = Planner.plan(oneHop, s)
    assert(plan == Expand(
      GetNodes("b", Some("B")), "b",
      GetEdges(Seq("X"), transpose = true), "a",
      toLabelPushed = Some("A"),   // nodeSel(A) = 0.5 < 0.8 → pushed pre-join
      keep = Set("a", "b")))
  }

  // OptimSpec scenario 2: 1 A, 4 B — B unselective → the reference picks
  // (A * X) * B: expand from a first, then filter by B *after* the expand
  // (nodeSel(B) = 0.8, not selective enough to push).
  test("one-hop: unselective B keeps the plan at a with post-filter (ref (A*X) * B)") {
    val s = stats(
      nodes = Map("A" -> 1, "B" -> 4),
      edges = Map("X" -> 3),
      triplets = Map(("A", "X", "B") -> 1L, ("B", "X", "B") -> 2L))
    val plan = Planner.plan(oneHop, s)
    assert(plan == Filter(
      Expand(GetNodes("a", Some("A")), "a",
        GetEdges(Seq("X"), transpose = false), "b",
        toLabelPushed = None, keep = Set("b")),   // a not returned → dropped at once
      "B"))
  }

  // OptimSpec scenario 3: two-hop chain (a:A)-[:X]->(b:B)<-[:Y]-(c:C)
  // RETURN c with A and C selective, B not. The reference's plan walks a→b
  // forward then b→c AGAINST the second edge (GetEdgeMatrix transpose=true)
  // with the C filter applied on the edge side. Ours: start at a (selective,
  // name tie-break vs c), push B (4/7 < 0.8), then the second hop must be a
  // transposed walk with C pushed; only c is kept at the end.
  test("two-hop: transposed second branch with pushed C (ref A*X*B*(Y*C))") {
    val p = pg(
      Vector(
        PatternEdge("a", "b", Seq("X"), undirected = false),
        PatternEdge("c", "b", Seq("Y"), undirected = false)), // (b)<-[:Y]-(c) normalized
      Map("a" -> Some("A"), "b" -> Some("B"), "c" -> Some("C")),
      returns = Seq("c"))
    val s = stats(
      nodes = Map("A" -> 1, "B" -> 4, "C" -> 1, "D" -> 1),
      edges = Map("X" -> 1, "Y" -> 4, "Z" -> 3),
      triplets = Map(("A", "X", "B") -> 1L, ("C", "Y", "B") -> 1L, ("D", "Y", "B") -> 3L))
    val plan = Planner.plan(p, s)
    assert(plan == Expand(
      Expand(GetNodes("a", Some("A")), "a",
        GetEdges(Seq("X"), transpose = false), "b",
        toLabelPushed = Some("B"), keep = Set("b")), // a dropped: only c returned
      "b", GetEdges(Seq("Y"), transpose = true), "c",
      toLabelPushed = Some("C"),
      keep = Set("c")))
  }

  // OptimSpec scenario 4: the fork (same pattern, RETURN b) — the reference
  // materializes the cheaper branch as a Diag semi-filter. Ours expresses
  // branch choice through the start binding: skewing |A| up and |C| down
  // must flip which branch is the frontier, symmetric stats flip it back.
  test("fork: start branch flips when label skew flips (ref Fork2DiagFilter alternatives)") {
    val p = pg(
      Vector(
        PatternEdge("a", "b", Seq("X"), undirected = false),
        PatternEdge("c", "b", Seq("Y"), undirected = false)),
      Map("a" -> Some("A"), "b" -> Some("B"), "c" -> Some("C")),
      returns = Seq("b"))
    def planWith(nA: Long, nC: Long): LogicNode = Planner.plan(p, stats(
      nodes = Map("A" -> nA, "B" -> 4, "C" -> nC),
      edges = Map("X" -> 4, "Y" -> 4),
      triplets = Map(("A", "X", "B") -> 4L, ("C", "Y", "B") -> 4L)))

    // |A| = 5 ≫ |C| = 1 → the c-branch is the frontier
    val cFirst = planWith(nA = 5, nC = 1)
    assert(cFirst == Expand(
      Expand(GetNodes("c", Some("C")), "c",
        GetEdges(Seq("Y"), transpose = false), "b",
        toLabelPushed = Some("B"), keep = Set("b")),  // c dropped immediately
      "b", GetEdges(Seq("X"), transpose = true), "a",
      toLabelPushed = Some("A"), keep = Set("a", "b")))

    // mirrored skew → the a-branch is the frontier
    val aFirst = planWith(nA = 1, nC = 5)
    assert(aFirst == Expand(
      Expand(GetNodes("a", Some("A")), "a",
        GetEdges(Seq("X"), transpose = false), "b",
        toLabelPushed = Some("B"), keep = Set("b")),
      "b", GetEdges(Seq("Y"), transpose = true), "c",
      toLabelPushed = Some("C"), keep = Set("b", "c")))
  }

  // beyond the reference (acyclic only, Readme.md:6): a cycle-closing edge
  // becomes an EdgePredicate semi-filter once both endpoints are bound
  test("cycle edge compiles to EdgePredicate") {
    val p = pg(
      Vector(
        PatternEdge("a", "b", Seq("X"), undirected = false),
        PatternEdge("b", "c", Seq("Y"), undirected = false),
        PatternEdge("a", "c", Seq("Z"), undirected = false)),
      Map("a" -> Some("A"), "b" -> Some("B"), "c" -> Some("C")),
      returns = Seq("a"))
    val s = stats(
      nodes = Map("A" -> 1, "B" -> 10, "C" -> 10),
      edges = Map("X" -> 10, "Y" -> 10, "Z" -> 10),
      triplets = Map.empty)
    def hasEdgePredicate(n: LogicNode): Boolean = n match {
      case EdgePredicate(_, _, _, _) => true
      case Expand(f, _, _, _, _, _) => hasEdgePredicate(f)
      case Filter(f, _) => hasEdgePredicate(f)
      case PropFilter(f, _) => hasEdgePredicate(f)
      case Join(l, r, _, _) => hasEdgePredicate(l) || hasEdgePredicate(r)
      case _ => false
    }
    assert(hasEdgePredicate(Planner.plan(p, s)))
  }

  /** Expansion order: target bindings of Expand nodes, innermost first. */
  private def expandOrder(n: LogicNode): Seq[String] = n match {
    case Expand(f, _, _, toB, _, _) => expandOrder(f) :+ toB
    case Filter(f, _)               => expandOrder(f)
    case PropFilter(f, _)           => expandOrder(f)
    case EdgePredicate(f, _, _, _)  => expandOrder(f)
    case _                          => Seq.empty
  }

  // A 10-edge chain (a)-..->(k), 11 vertices — above ExhaustiveEdgeLimit,
  // inside DpEdgeLimit. Stats are skewed so the left side COLLAPSES the
  // cardinality (the d—e edge has triplet count 1 against label counts of
  // 100 → fan 0.01) while the right side grows it (fan 2 per hop). A pure
  // greedy (beam of 1) from the most selective start f takes the right
  // side's locally-cheap fan-2 hops first and then pays the fan-10 left
  // entry at card 32 (cost ≈ 474); the stats-optimal order clears the
  // collapsing left side first and replays the right side from card 1
  // (cost ≈ 80) — an order greedy provably misses, requiring the DP's
  // full coverage of expansion orders (reference Memo coverage,
  // optim/Memo.scala:85-106).
  test("10-edge chain: DP finds the card-collapsing order greedy misses") {
    val vs = "abcdefghijk".map(_.toString)
    val edges = vs.zip(vs.tail).map { case (s, d) =>
      PatternEdge(s, d, Seq("X"), undirected = false) }.toVector
    val labels = vs.map(v => v -> Some(v.toUpperCase)).toMap
    val p = pg(edges, labels, returns = Seq("a", "k"))
    val trips = Map(
      ("A", "X", "B") -> 100L, ("B", "X", "C") -> 100L, ("C", "X", "D") -> 100L,
      ("D", "X", "E") -> 1L,   // the collapsing edge: fan 1/100 = 0.01
      ("E", "X", "F") -> 10L,  // left entry from f: fan 10/1 = 10
      ("F", "X", "G") -> 2L,   // right entry from f: fan 2/1 = 2
      ("G", "X", "H") -> 200L, ("H", "X", "I") -> 200L, // fan 200/100 = 2 …
      ("I", "X", "J") -> 200L, ("J", "X", "K") -> 200L)
    val s = stats(
      nodes = vs.map(v => v.toUpperCase -> (if (v == "f") 1L else 100L)).toMap,
      edges = Map("X" -> trips.values.sum),
      triplets = trips)
    val order = expandOrder(Planner.plan(p, s))
    assert(order.size == 10 && order.distinct.size == 10) // all 10 expansions present
    // the stats-optimal order finishes the collapsing left side BEFORE
    // growing the right side; greedy would emit g,h,i,j,k first
    val leftDone = Seq("a", "b", "c").map(order.indexOf).max
    val rightStart = Seq("h", "i", "j", "k").map(order.indexOf).min
    assert(leftDone < rightStart,
      s"left side must complete before the right side grows: $order")
  }
}
