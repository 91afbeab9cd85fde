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
   * Set semantics (reference Boolean-matrix ANY_PAIR) → always DISTINCT on
   * the returned bindings.
   */
  def query(cypher: String): DataFrame = {
    val q = CypherParser.parse(cypher)
    val pg = Pattern.fromQuery(q)
    val root = Planner.plan(pg, stats)
    val df = PatternExec.compile(root, graph)
    val out = df.select(pg.returns.map(col): _*).dropDuplicates()
    pg.limit.fold(out)(out.limit)
  }

  /** Like `query`, but joins each returned binding back to its node row for
    * property columns, prefixed `<binding>_` (reference MatrixTuples +
    * DataStore.getVs render step). */
  def queryNodes(cypher: String): DataFrame = {
    val q = CypherParser.parse(cypher)
    val ids = query(cypher)
    q.returns.foldLeft(ids) { (acc, b) =>
      val props = graph.nodes.columns.filter(_ != "id")
        .map(c => col(c).as(s"${b}_$c"))
      acc.join(graph.nodes.select((col("id").as(b) +: props.toSeq): _*), Seq(b), "left")
    }
  }
}
