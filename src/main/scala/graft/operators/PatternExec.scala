package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.plans._
import graft.cypher.Ast

/**
 * Compiles a join-ordered [[LogicNode]] tree 1:1 to DataFrame operations —
 * the physical layer. The mapping from the reference's matrix operators
 * (g4s-optimizer/.../optim/impls/Operator.scala):
 *
 *  - GetNodeMatrix (:230-248)  → label-filtered node scan (Catalyst pushes
 *    the predicate into parquet)
 *  - GetEdgeMatrix (:250-268)  → type-filtered edge scan; `transpose` = swap
 *    which endpoint is the join key
 *  - ExpandMul, Boolean mxm over ANY_PAIR (:270-296,150-197) → inner
 *    equi-join + projection; ANY_PAIR's existence-only semantics
 *    (:401-424) = dropDuplicates *after projecting away bindings* — kept
 *    columns make intermediate dedup a no-op, so we only pay the shuffle
 *    when the projection actually shrinks the tuple
 *  - FilterMul (:298-324) and Diag (:326-351) → left-semi joins
 *  - MatrixTuples (:377-399)   → the resulting DataFrame itself (collect is
 *    the caller's choice, never the engine's)
 *
 * Every binding is a BIGINT id column named after the binding; property
 * access joins back to the node table at the end (reference DataStore.getVs,
 * g4s-matrix-graph/.../graph/DataStore.scala:84-91).
 */
object PatternExec {

  /** Compiled plan + set-semantics tracking: `distinct` = the DataFrame is
    * provably duplicate-free on its binding columns, so downstream duplicate
    * elimination (GraphDB.query's final set-semantics guarantee) can be
    * skipped — one full shuffle saved per query on multi-binding returns. */
  final case class Compiled(df: DataFrame, distinct: Boolean)

  def compile(node: LogicNode, g: PropertyGraph): DataFrame =
    compileTracked(node, g).df

  def compileTracked(node: LogicNode, g: PropertyGraph): Compiled = node match {
    case GetNodes(b, label) =>
      // node ids are unique (PropertyGraph invariant)
      Compiled(label.fold(g.nodes)(l => g.nodesByLabel(l)).select(col("id").as(b)),
        distinct = true)

    case Expand(from, fromB, edges, to, pushedLabel, keep) =>
      val fromC = compileTracked(from, g)
      // varlen reach is seeded from the frontier's distinct source ids so the
      // iterated joins never materialize walks from unreachable nodes
      val srcs = if (edges.maxHops > 1) Some(fromC.df.select(col(fromB)).distinct()) else None
      var e = edgeScan(edges, g, fromB, to, srcs)
      pushedLabel.foreach { l =>
        // FilterExpandCommutative: constrain edge endpoint by label pre-join
        // (for varlen this filters the WALK ENDPOINT only — intermediate
        // levels stay unconstrained inside edgeScan, as the semantics demand)
        e = e.join(g.nodesByLabel(l).select(col("id").as(to)), Seq(to), "left_semi")
      }
      val joined = fromC.df.join(e, Seq(fromB), "inner")
      // joined rows distinct iff frontier rows are AND the (from, to) edge
      // pairs are unique: a single concrete type of a distinct-edged graph,
      // or a varlen reach (explicitly deduped inside edgeScan). Multiple
      // types (or the undirected union) can repeat a pair.
      val pairsUnique = edges.maxHops > 1 ||
        (g.edgesDistinct && edges.types.size == 1 && !edges.undirected)
      project(joined, keep, from.carried + to, fromC.distinct && pairsUnique)

    case Filter(frontier, label) =>
      val f = compileTracked(frontier, g)
      // left-semi never duplicates left rows → distinctness preserved
      Compiled(f.df.join(g.nodesByLabel(label).select(col("id").as(frontier.head)),
        Seq(frontier.head), "left_semi"), f.distinct)

    case PropFilter(frontier, pred) =>
      val f = compileTracked(frontier, g)
      val filtered = g.nodes.filter(predColumn(pred)).select(col("id").as(pred.binding))
      Compiled(f.df.join(filtered, Seq(pred.binding), "left_semi"), f.distinct)

    case EdgePredicate(frontier, edges, src, dst) =>
      val f = compileTracked(frontier, g)
      val srcs = if (edges.maxHops > 1) Some(f.df.select(col(src)).distinct()) else None
      val e = edgeScan(edges, g, src, dst, srcs)
      Compiled(f.df.join(e, Seq(src, dst), "left_semi"), f.distinct)

    case Join(l, r, on, keep) =>
      val lc = compileTracked(l, g); val rc = compileTracked(r, g)
      val joined = lc.df.join(rc.df, Seq(on), "inner")
      project(joined, keep, l.carried ++ r.carried, lc.distinct && rc.distinct)

    case CartesianProduct(l, r, keep) =>
      val lc = compileTracked(l, g); val rc = compileTracked(r, g)
      project(lc.df.crossJoin(rc.df), keep, l.carried ++ r.carried,
        lc.distinct && rc.distinct)
  }

  /** Edge scan as a two-column (fromB, toB) DataFrame, direction resolved.
    *
    * For a variable-length pattern (`maxHops > 1`) the scan is the bounded
    * WALK reach: pairs connected by a walk of length in [minHops, maxHops],
    * built as maxHops−1 statically-unrolled join levels with per-level AND
    * cross-level dedup (the per-level `distinct` is what bounds growth — a
    * level is at most |srcs|·|nodes| pairs regardless of walk multiplicity,
    * the same reason Boolean-matrix powers don't blow up). `srcs` restricts
    * level 1 to the frontier's source ids, so the reach is computed for
    * reachable starts only — the varlen analogue of pushing the frontier
    * into the scan. */
  private def edgeScan(e: GetEdges, g: PropertyGraph, fromB: String, toB: String,
                       srcs: Option[DataFrame] = None): DataFrame = {
    // a single-hop transpose scan joins on the edge's dst — read the
    // dst-keyed storage copy when the graph has one (identical rows;
    // bucketed layouts then skip the edge-side exchange). Varlen and
    // undirected scans iterate/union both orientations, so they keep the
    // forward copy.
    val physical =
      if (e.transpose && !e.undirected && e.maxHops <= 1) g.edgesRevByType(e.types)
      else g.edgesByType(e.types)
    // edge-property predicates filter the scan before the endpoint swap, so
    // they hold regardless of direction/transpose and Catalyst pushes them
    // into the parquet read alongside the type filter
    val base = e.preds.foldLeft(physical)((df, p) => df.filter(predColumn(p)))
    val fwd = base.select(col("src").as(fromB), col("dst").as(toB))
    val hop1 =
      if (e.undirected) fwd.unionByName(base.select(col("dst").as(fromB), col("src").as(toB)))
      else if (e.transpose) base.select(col("dst").as(fromB), col("src").as(toB))
      else fwd
    if (e.maxHops <= 1) hop1
    else {
      val seeded = srcs.fold(hop1)(s => hop1.join(s, Seq(fromB), "left_semi"))
      var level = seeded.distinct()
      var acc = if (e.minHops <= 1) level else level.filter(lit(false))
      for (k <- 2 to e.maxHops) {
        val step = hop1.select(col(fromB).as("__h_src"), col(toB).as("__h_dst"))
        level = level.join(step, level(toB) === col("__h_src"))
          .select(col(fromB), col("__h_dst").as(toB)).distinct()
        if (k >= e.minHops) acc = acc.unionByName(level)
      }
      acc.distinct()
    }
  }

  /** Set semantics: dedup only when the projection dropped columns (a
    * shrinking projection can introduce duplicates even from distinct input;
    * a full-width projection preserves whatever distinctness the input had). */
  private def project(df: DataFrame, keep: Set[String], available: Set[String],
                      inputDistinct: Boolean): Compiled = {
    val cols = keep.toSeq.sorted.map(col)
    val projected = df.select(cols: _*)
    if (keep == available) Compiled(projected, inputDistinct)
    else Compiled(projected.dropDuplicates(), distinct = true)
  }

  /** Pushdown predicate over a node/edge scan: columns are bare property
    * names, so Catalyst pushes the comparison into the parquet read. */
  private def predColumn(p: Ast.Cmp): Column = Preds.column(p, (_, prop) => col(prop))
}
