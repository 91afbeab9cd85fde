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

  def compile(node: LogicNode, g: PropertyGraph): DataFrame = node match {
    case GetNodes(b, label) =>
      label.fold(g.nodes)(l => g.nodesByLabel(l)).select(col("id").as(b))

    case Expand(from, fromB, edges, to, pushedLabel, keep) =>
      val fromDF = compile(from, g)
      var e = edgeScan(edges, g, fromB, to)
      pushedLabel.foreach { l =>
        // FilterExpandCommutative: constrain edge endpoint by label pre-join
        e = e.join(g.nodesByLabel(l).select(col("id").as(to)), Seq(to), "left_semi")
      }
      val joined = fromDF.join(e, Seq(fromB), "inner")
      project(joined, keep, from.carried + to)

    case Filter(frontier, label) =>
      val f = compile(frontier, g)
      f.join(g.nodesByLabel(label).select(col("id").as(frontier.head)),
        Seq(frontier.head), "left_semi")

    case PropFilter(frontier, pred) =>
      val f = compile(frontier, g)
      val filtered = g.nodes.filter(predColumn(pred)).select(col("id").as(pred.binding))
      f.join(filtered, Seq(pred.binding), "left_semi")

    case EdgePredicate(frontier, edges, src, dst) =>
      val f = compile(frontier, g)
      val e = edgeScan(edges, g, src, dst)
      f.join(e, Seq(src, dst), "left_semi")

    case Join(l, r, on, keep) =>
      val joined = compile(l, g).join(compile(r, g), Seq(on), "inner")
      project(joined, keep, l.carried ++ r.carried)

    case CartesianProduct(l, r, keep) =>
      project(compile(l, g).crossJoin(compile(r, g)), keep, l.carried ++ r.carried)
  }

  /** Edge scan as a two-column (fromB, toB) DataFrame, direction resolved. */
  private def edgeScan(e: GetEdges, g: PropertyGraph, fromB: String, toB: String): DataFrame = {
    val base = g.edgesByType(e.types)
    val fwd = base.select(col("src").as(fromB), col("dst").as(toB))
    if (e.undirected)
      fwd.unionByName(base.select(col("dst").as(fromB), col("src").as(toB)))
    else if (e.transpose)
      base.select(col("dst").as(fromB), col("src").as(toB))
    else fwd
  }

  /** Set semantics: dedup only when the projection dropped columns. */
  private def project(df: DataFrame, keep: Set[String], available: Set[String]): DataFrame = {
    val cols = keep.toSeq.sorted.map(col)
    val projected = df.select(cols: _*)
    if (keep == available) projected else projected.dropDuplicates()
  }

  private def predColumn(p: Ast.Cmp): Column = {
    val c = col(p.prop)
    val v = lit(p.value)
    p.op match {
      case "="  => c === v
      case "<>" => c =!= v
      case "<"  => c < v
      case "<=" => c <= v
      case ">"  => c > v
      case ">=" => c >= v
    }
  }
}
