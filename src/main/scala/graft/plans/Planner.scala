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
 * Here the pattern space is tiny (a handful of edges), so an EXHAUSTIVE
 * branch-and-bound search over expansion orders with the same cost model
 * covers the reference's alternative space without memo machinery: every
 * start binding × every admissible edge order is enumerated, the greedy
 * (cheapest-next-expansion) plan seeds the incumbent, and prefixes are cut
 * as soon as their accumulated cost reaches the incumbent's (cost only
 * grows). Components above [[ExhaustiveEdgeLimit]] edges fall back to pure
 * greedy. The emitted tree is already join-ordered; Catalyst handles
 * pushdown / pruning / physical join selection (SURVEY §7.3). The
 * `FilterExpandCommutative` alternative — push the target label onto the
 * edge scan vs. filter after the expand — is decided per hop from label
 * selectivity.
 *
 * Why the logical `Join` node is NOT emitted here (reference
 * Fork2DiagFilter, optim/rules/impl/Fork2DiagFilter.scala:21-59): the
 * reference's frontier is a single Boolean matrix that cannot carry more
 * than (branch-start, head) bindings, so fork patterns MUST be recombined
 * by a Join/Diag merge of separately-evaluated branches. This executor's
 * frontier is a DataFrame that carries every still-needed binding through
 * `Expand`, and under the shared cardinality model an in-line expansion of
 * the second branch costs `1.2 · card(joined)` while a branch-split costs
 * the same `1.2 · card(joined)` PLUS the separately-planned branch
 * (`1.2 · card(branch)`), with identical join-output cardinality
 * (card·trip/|mid| either way) — the split alternative is never strictly
 * cheaper, so enumerating it would only widen the search space with
 * dominated plans. `Join` remains first-class plan algebra for the
 * programmatic entry point (reference §3.2 builds LogicNodes directly) and
 * is compiled and tested in PatternExec (JoinSpec ports the reference's
 * GrBTuples merge-join vectors through it).
 */
object Planner {

  /** Components with more edges than this use greedy-only planning; below
    * it, exhaustive search (≤ 8! orders before pruning, milliseconds). */
  val ExhaustiveEdgeLimit = 8

  final case class Planned(root: LogicNode, estCard: Double, cost: Double)

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
    pg.referenced.toSet ++ remaining.flatMap(e => Seq(e.src, e.dst))

  /** One planning step: the tree/bound/card/cost state of a search prefix. */
  private final case class State(node: LogicNode, bound: Set[String],
                                 remaining: Seq[PatternEdge],
                                 card: Double, cost: Double)

  private def planComponent(pg: PatternGraph, comp: Set[String], stats: GraphStats): Planned = {
    val compEdges = pg.edges.filter(e => comp.contains(e.src))
    val exhaustive = compEdges.size <= ExhaustiveEdgeLimit

    def applyPreds(node: LogicNode, binding: String): LogicNode =
      pg.predicates.filter(_.binding == binding).foldLeft(node)((n, p) => PropFilter(n, p))

    // WHERE conjuncts on this edge's relationship variable ride the edge scan
    def edgePreds(e: PatternEdge): Seq[graft.cypher.Ast.Cmp] =
      e.name.map(n => pg.edgePredicates.filter(_.binding == n)).getOrElse(Seq.empty)

    // deterministic start preference: most selective label, then name — the
    // first complete plan is the greedy one, and improvements must be strict,
    // so ties always resolve to the greedy choice (stable golden plans)
    val starts = comp.toSeq.sortBy(b => (stats.nodeCount(pg.labels(b)), b))
    var best: Planned = null

    def record(s: State): Unit =
      if (best == null || s.cost < best.cost)
        best = Planned(s.node, s.card, s.cost)

    def step(s: State): Unit = {
      // forced: close any cycle edges first — pure semi-filters, they only
      // shrink the frontier, so applying them asap is always optimal
      val (cycles, rest) = s.remaining.partition(e => s.bound(e.src) && s.bound(e.dst))
      var node = s.node; var card = s.card; var cost = s.cost
      cycles.foreach { e =>
        node = EdgePredicate(node, GetEdges(e.types, transpose = false, e.undirected,
          e.minHops, e.maxHops, edgePreds(e)), e.src, e.dst)
        card = math.max(card * 0.5, 1.0)
        cost += 1.2 * card
      }
      if (rest.isEmpty) { record(State(node, s.bound, rest, card, cost)); return }
      if (best != null && cost >= best.cost) return // branch-and-bound prune
      val candidates = rest.filter(e => s.bound(e.src) || s.bound(e.dst))
      require(candidates.nonEmpty, "pattern component not connected")
      val ordered = candidates.map(e => e -> fanout(e, s.bound, pg, stats))
        .sortBy { case (e, f) => (f, e.src, e.dst) }
      val tried = if (exhaustive) ordered else ordered.take(1) // greedy = beam of 1
      tried.foreach { case (edge, fan) =>
        val transpose = !s.bound(edge.src) // walking against the arrow
        val (fromB, toB) = if (transpose) (edge.dst, edge.src) else (edge.src, edge.dst)
        val toLabel = pg.labels(toB)
        // FilterExpandCommutative choice: selective label → pre-filter the edge scan
        val push = toLabel.exists(_ => stats.nodeSel(toLabel) < 0.8)
        val nextRemaining = rest.filterNot(_ eq edge)
        val keep = (s.bound + toB) intersect (needed(pg, nextRemaining) + toB)
        var n: LogicNode = Expand(node, fromB, GetEdges(edge.types, transpose, edge.undirected,
          edge.minHops, edge.maxHops, edgePreds(edge)), toB, if (push) toLabel else None, keep)
        if (!push && toLabel.isDefined) n = Filter(n, toLabel.get)
        n = applyPreds(n, toB)
        val nextCard = math.max(card * fan, 1.0)
        step(State(n, s.bound + toB, nextRemaining, nextCard, cost + 1.2 * nextCard))
      }
    }

    val startsTried = if (exhaustive) starts else starts.take(1)
    startsTried.foreach { start =>
      val node = applyPreds(GetNodes(start, pg.labels(start)), start)
      val card = math.max(stats.nodeCount(pg.labels(start)).toDouble, 1.0)
      step(State(node, Set(start), compEdges, card, 0.0))
    }
    best
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
    val hop = { val b = trip / denom; if (e.undirected) b * 2 else b }
    // varlen: endpoint pairs from walks of every length in [min, max] —
    // estimated as the sum of per-length fan-outs (geometric in the hop fan)
    if (e.maxHops > 1) (e.minHops to e.maxHops).map(k => math.pow(hop, k)).sum
    else hop
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
