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
 * grows). Components above [[ExhaustiveEdgeLimit]] edges switch to DP over
 * connected bound-vertex subsets (exact under the cost model to
 * [[DpEdgeLimit]] edges — see planDp); beyond that, pure greedy.
 * The emitted tree is already join-ordered; Catalyst handles
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

  /** Components with more edges than this leave the exhaustive
    * branch-and-bound (≤ 8! orders before pruning, milliseconds). */
  val ExhaustiveEdgeLimit = 8

  /** Between [[ExhaustiveEdgeLimit]]+1 and this, planning switches to DP
    * over connected bound-vertex subsets — the memo's coverage without the
    * memo (reference Memo dedups commuted forms by group signature,
    * optim/Memo.scala:85-106, logic/LogicNode.scala:20-31): every expansion
    * order reaching the same bound set collapses into one DP state holding
    * the Pareto-minimal (cost, card) prefixes, so the search is
    * O(2^V · ParetoWidth · V) instead of O(V!). Above this, pure greedy. */
  val DpEdgeLimit = 14

  /** Per-DP-state cap on retained Pareto-incomparable (cost, card) prefixes.
    * Cost-optimal continuations of a state need only the lowest-cost and
    * lowest-card corners; 8 incomparable corners is far beyond what the
    * monotone cost model produces in practice. */
  val ParetoWidth = 8

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

    // forced: close any cycle edges first — pure semi-filters, they only
    // shrink the frontier, so applying them asap is always optimal
    def closeCycles(s: State): State = {
      val (cycles, rest) = s.remaining.partition(e => s.bound(e.src) && s.bound(e.dst))
      var node = s.node; var card = s.card; var cost = s.cost
      cycles.foreach { e =>
        node = EdgePredicate(node, GetEdges(e.types, transpose = false, e.undirected,
          e.minHops, e.maxHops, edgePreds(e)), e.src, e.dst)
        card = math.max(card * 0.5, 1.0)
        cost += 1.2 * card
      }
      State(node, s.bound, rest, card, cost)
    }

    // one expansion across `edge` from the bound side (shared by all three
    // search tiers; `s` must already be cycle-closed)
    def expandOne(s: State, edge: PatternEdge, fan: Double): State = {
      val transpose = !s.bound(edge.src) // walking against the arrow
      val (fromB, toB) = if (transpose) (edge.dst, edge.src) else (edge.src, edge.dst)
      val toLabel = pg.labels(toB)
      // FilterExpandCommutative choice: selective label → pre-filter the edge scan
      val push = toLabel.exists(_ => stats.nodeSel(toLabel) < 0.8)
      val nextRemaining = s.remaining.filterNot(_ eq edge)
      val keep = (s.bound + toB) intersect (needed(pg, nextRemaining) + toB)
      var n: LogicNode = Expand(s.node, fromB, GetEdges(edge.types, transpose, edge.undirected,
        edge.minHops, edge.maxHops, edgePreds(edge)), toB, if (push) toLabel else None, keep)
      if (!push && toLabel.isDefined) n = Filter(n, toLabel.get)
      n = applyPreds(n, toB)
      val nextCard = math.max(s.card * fan, 1.0)
      State(n, s.bound + toB, nextRemaining, nextCard, s.cost + 1.2 * nextCard)
    }

    def orderedCandidates(s: State): Seq[(PatternEdge, Double)] = {
      val candidates = s.remaining.filter(e => s.bound(e.src) || s.bound(e.dst))
      require(candidates.nonEmpty, "pattern component not connected")
      candidates.map(e => e -> fanout(e, s.bound, pg, stats))
        .sortBy { case (e, f) => (f, e.src, e.dst) }
    }

    def startState(start: String): State = {
      val node = applyPreds(GetNodes(start, pg.labels(start)), start)
      val card = math.max(stats.nodeCount(pg.labels(start)).toDouble, 1.0)
      State(node, Set(start), compEdges, card, 0.0)
    }

    def step(s0: State): Unit = {
      val s = closeCycles(s0)
      if (s.remaining.isEmpty) { record(s); return }
      if (best != null && s.cost >= best.cost) return // branch-and-bound prune
      val ordered = orderedCandidates(s)
      val tried = if (exhaustive) ordered else ordered.take(1) // greedy = beam of 1
      tried.foreach { case (edge, fan) => step(expandOne(s, edge, fan)) }
    }

    // DP over connected bound-vertex subsets: every order reaching the same
    // bound set shares the same remaining-edge set (cycle edges are forced
    // closed), so bound-set = the DP state. Each state keeps the Pareto-
    // minimal (cost, card) prefixes — min cost alone is not sufficient
    // because future cost scales with card.
    def planDp(): Planned = {
      val verts = comp.toSeq.sorted
      val vIdx = verts.zipWithIndex.toMap
      val states = scala.collection.mutable.Map[Int, Vector[State]]()
      def add(mask: Int, s: State): Unit = {
        val cur = states.getOrElse(mask, Vector.empty)
        if (cur.exists(t => t.cost <= s.cost && t.card <= s.card)) return // dominated
        val kept = cur.filterNot(t => s.cost <= t.cost && s.card <= t.card)
        states(mask) = (kept :+ s).sortBy(t => (t.cost, t.card)).take(ParetoWidth)
      }
      starts.foreach(b => add(1 << vIdx(b), closeCycles(startState(b))))
      val full = (1 << verts.size) - 1
      // transitions only add bits, so numeric ascending order visits every
      // state after all of its predecessors
      (1 until full).foreach { mask =>
        states.get(mask).foreach(_.foreach { s =>
          orderedCandidates(s).foreach { case (edge, fan) =>
            val next = closeCycles(expandOne(s, edge, fan))
            val toB = if (s.bound(edge.src)) edge.dst else edge.src
            add(mask | (1 << vIdx(toB)), next)
          }
        })
      }
      val win = states(full).minBy(t => (t.cost, t.card))
      Planned(win.node, win.card, win.cost)
    }

    if (!exhaustive && compEdges.size <= DpEdgeLimit) return planDp()

    val startsTried = if (exhaustive) starts else starts.take(1)
    startsTried.foreach(start => step(startState(start)))
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
