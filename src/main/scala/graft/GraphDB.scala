package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.{GraphStats, PropertyGraph}
import graft.cypher.CypherParser
import graft.plans.{LogicNode, Pattern, Planner}
import graft.operators.PatternExec

/**
 * Cypher-over-Spark pipeline: parse → pattern graph → stats-ordered logical
 * plan → DataFrame (≙ reference GraphDB "parsing / optimising / evaluating",
 * g4s-matrix-graph/.../graph/GraphDB.scala:10-33).
 *
 * Stats are snapshotted once per GraphDB, mirroring the reference's
 * `withStats(_.copy)` snapshot-before-plan (GraphDB.scala:25).
 */
final class GraphDB(val graph: PropertyGraph, precomputed: Option[GraphStats] = None) {

  lazy val stats: GraphStats = precomputed.getOrElse(graph.computeStats())

  def plan(cypher: String): LogicNode =
    Planner.plan(Pattern.fromQuery(CypherParser.parse(cypher)), stats)

  /**
   * Run a Cypher query; result has one BIGINT id column per returned binding.
   * Set semantics (reference Boolean-matrix ANY_PAIR) → DISTINCT on the
   * returned bindings, but the final duplicate elimination is SKIPPED when
   * the compiled plan already guarantees it (PatternExec set-semantics
   * tracking) — the plan's own projection-shrink dedup usually lands exactly
   * on the returned bindings, and paying a second full shuffle for an
   * already-distinct million-row result was round 1's top plan defect.
   */
  def query(cypher: String): DataFrame =
    run(Pattern.fromQuery(CypherParser.parse(cypher)))

  private def run(pg: Pattern.PatternGraph): DataFrame = {
    val root = Planner.plan(pg, stats)
    val c = PatternExec.compileTracked(root, graph)
    val projected = c.df.select(pg.referenced.map(col): _*)
    val deduped =
      if (c.distinct && pg.referenced.toSet == root.carried) projected
      else projected.dropDuplicates()
    // count(b) = number of DISTINCT matches per group (set semantics; the
    // input is already duplicate-free, so this is one combinable groupBy)
    val aggregated =
      if (pg.counts.isEmpty) deduped
      else {
        val aggs = pg.counts.map(b => countDistinct(col(b)).as(s"count_$b"))
        if (pg.returns.isEmpty) deduped.agg(aggs.head, aggs.tail: _*)
        else deduped.groupBy(pg.returns.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    // ORDER BY over returned bindings / count aliases (beyond the reference
    // — relational surface Spark gives for free; a TakeOrderedAndProject
    // when LIMIT follows, so the sort never materializes globally)
    val ordered =
      if (pg.orderBy.isEmpty) aggregated
      else aggregated.orderBy(pg.orderBy.map(k =>
        if (k.asc) col(k.binding).asc else col(k.binding).desc): _*)
    pg.limit.fold(ordered)(ordered.limit)
  }

  /** Like `query`, but joins each returned binding back to its node row for
    * property columns, prefixed `<binding>_` (reference MatrixTuples +
    * DataStore.getVs render step). Parses once; the binding ids come from
    * the same compiled plan `query` runs. */
  def queryNodes(cypher: String): DataFrame = {
    val pg = Pattern.fromQuery(CypherParser.parse(cypher))
    pg.returns.foldLeft(run(pg)) { (acc, b) =>
      val props = graph.nodes.columns.filter(_ != "id")
        .map(c => col(c).as(s"${b}_$c"))
      acc.join(graph.nodes.select((col("id").as(b) +: props.toSeq): _*), Seq(b), "left")
    }
  }
}
