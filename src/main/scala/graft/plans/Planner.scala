package graft.plans

import graft.graph.GraphStats
import graft.plans.Pattern.{PatternEdge, PatternGraph}

/**
 * Stats-driven join-order planner for pattern graphs.
 *
 * The reference runs a Cascades-style memo optimizer over Expand/Filter
 * alternatives with `cost = 1.2·card + Σ children` and triplet-conditional
 * selectivities (g4s-optimizer/.../optim/impls/Operator.scala:116-148,
 * columbia/StatsCalculator.scala:19-77, optim/StatsStore.scala:111-255).
 * Here the pattern space is tiny (a handful of edges), so a greedy
 * cheapest-next-expansion enumeration with the same cardinality model
 * reproduces its choices without memo machinery; the emitted tree is already
 * join-ordered and Catalyst handles pushdown / physical join selection
 * (SURVEY §7.3). The `FilterExpandCommutative` alternative — push the target
 * label onto the edge scan vs. filter after the expand — is decided per hop
 * from label selectivity.
 */
object Planner {

  final case class Planned(root: LogicNode, estCard: Double)

  def plan(pg: PatternGraph, stats: GraphStats): LogicNode = {
    val components = connectedComponents(pg)
    val planned = components.map(c => planComponent(pg, c, stats))
    // disconnected pattern parts → cartesian product (rare; tiny sides first)
    planned.sortBy(_.estCard).map(_.root).reduceLeft { (a, b) =>
      CartesianProduct(a, b, a.carried ++ b.carried)
    }
  }

  /** Bindings needed downstream of a point where `remaining` edges are unprocessed. */
  private def needed(pg: PatternGraph, remaining: Seq[PatternEdge]): Set[String] =
    pg.returns.toSet ++ remaining.flatMap(e => Seq(e.src, e.dst))

  private def planComponent(pg: PatternGraph, comp: Set[String], stats: GraphStats): Planned = {
    val compEdges = pg.edges.filter(e => comp.contains(e.src))
    val preds = pg.predicates.filter(p => comp.contains(p.binding)).toBuffer

    def applyPreds(node: LogicNode, binding: String): LogicNode = {
      var n = node
      val (mine, rest) = preds.partition(_.binding == binding)
      mine.foreach { p => n = PropFilter(n, p) }
      preds.clear(); preds ++= rest
      n
    }

    // start from the most selective labelled binding (name tie-break for
    // deterministic plans — golden tests depend on it)
    val start = comp.minBy(b => (stats.nodeCount(pg.labels(b)), b))
    var node: LogicNode = applyPreds(GetNodes(start, pg.labels(start)), start)
    var card = math.max(stats.nodeCount(pg.labels(start)).toDouble, 1.0)
    var bound = Set(start)
    var remaining = compEdges

    while (remaining.nonEmpty) {
      // close any cycle edges first — pure filters, they only shrink the frontier
      val (cycles, rest) = remaining.partition(e => bound(e.src) && bound(e.dst))
      cycles.foreach { e =>
        node = EdgePredicate(node, GetEdges(e.types, transpose = false, e.undirected), e.src, e.dst)
        card = math.max(card * 0.5, 1.0)
      }
      remaining = rest
      if (remaining.nonEmpty) {
        val candidates = remaining.filter(e => bound(e.src) || bound(e.dst))
        require(candidates.nonEmpty, "pattern component not connected")
        // pick the expansion with the smallest estimated output cardinality
        val (edge, fan) = candidates.map(e => e -> fanout(e, bound, pg, stats))
          .minBy { case (e, f) => (f, e.src, e.dst) }
        val transpose = !bound(edge.src) // walking against the arrow
        val (fromB, toB) = if (transpose) (edge.dst, edge.src) else (edge.src, edge.dst)
        val toLabel = pg.labels(toB)
        // FilterExpandCommutative choice: selective label → pre-filter the edge scan
        val push = toLabel.exists(_ => stats.nodeSel(toLabel) < 0.8)
        remaining = remaining.filterNot(_ eq edge)
        val keep = (bound + toB) intersect (needed(pg, remaining) + toB)
        node = Expand(node, fromB, GetEdges(edge.types, transpose, edge.undirected), toB,
          if (push) toLabel else None, keep)
        if (!push && toLabel.isDefined) node = Filter(node, toLabel.get)
        node = applyPreds(node, toB)
        bound += toB
        card = math.max(card * fan, 1.0)
      }
    }
    Planned(node, card)
  }

  /**
   * Average fan-out of expanding across `e` from whichever endpoint is bound:
   * triplet-conditional degree = tripletCount(srcL, types, dstL) / |bound-side
   * label| (≙ StatsStore.nodeEdgeOutSel/nodeEdgeInSel).
   */
  private def fanout(e: PatternEdge, bound: Set[String], pg: PatternGraph, stats: GraphStats): Double = {
    val sL = pg.labels(e.src)
    val dL = pg.labels(e.dst)
    val trip = {
      val t = stats.tripletCount(sL, e.types, dL)
      if (t > 0) t.toDouble
      else math.max(stats.edgeCount(e.types).toDouble * stats.nodeSel(sL).max(1e-9) * stats.nodeSel(dL).max(1e-9), 1.0)
    }
    val fromLabel = if (bound(e.src)) sL else dL
    val denom = math.max(stats.nodeCount(fromLabel).toDouble, 1.0)
    val base = trip / denom
    if (e.undirected) base * 2 else base
  }

  private def connectedComponents(pg: PatternGraph): Seq[Set[String]] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    pg.bindings.foreach(b => find(b))
    pg.edges.foreach(e => union(e.src, e.dst))
    pg.bindings.groupBy(find).values.toSeq
  }
}
