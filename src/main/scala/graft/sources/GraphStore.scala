package graft.sources

import org.apache.spark.sql.SparkSession
import graft.graph.PropertyGraph

/**
 * Bucketed on-disk layout for a property graph — the storage half of
 * exchange-free pattern matching at the 100 TB scale:
 *
 *  - `nodes` bucketed by `id`: every property join-back and label semi-join
 *    keyed on a binding (an aliased `id`) reads co-located buckets.
 *  - `edges` bucketed by `src`: the forward Expand join
 *    (`frontier.id = edges.src`) skips the edge-side exchange — only the
 *    (usually far smaller) frontier shuffles.
 *  - `edges_rev` — the SAME rows bucketed by `dst`: incoming expands join on
 *    `dst` and read this copy instead
 *    ([[graft.operators.PatternExec]] picks per join key via
 *    [[PropertyGraph.edgesRevByType]]). This is the reference's
 *    eagerly-maintained transpose matrix family
 *    (ConcurrentDirectedGraph.scala:146-148) re-expressed as STORAGE
 *    layout: 2× edge storage buys zero-shuffle traversal in both
 *    directions — the classic space-for-shuffle trade a 1000-executor
 *    cluster always takes.
 *
 * Bucket metadata lives in the session catalog (`saveAsTable`; production
 * points it at a metastore). Loading from a fresh session requires the
 * tables registered there — `loadBucketed` reads by table name.
 */
object GraphStore {

  /** Write `g` as bucketed tables `<prefix>_nodes` / `<prefix>_edges` /
    * `<prefix>_edges_rev` under `path`. Overwrites. */
  def saveBucketed(g: PropertyGraph, prefix: String, path: String, buckets: Int): Unit = {
    Bucketing.writeBucketed(g.nodes, s"${prefix}_nodes", s"$path/nodes", buckets, Seq("id"))
    Bucketing.writeBucketed(g.edges, s"${prefix}_edges", s"$path/edges", buckets, Seq("src"))
    Bucketing.writeBucketed(g.edges, s"${prefix}_edges_rev", s"$path/edges_rev",
      buckets, Seq("dst"))
  }

  /** The graph backed by the bucketed tables [[saveBucketed]] wrote.
    * `edgesDistinct` is the caller's declaration (the layout does not
    * change row multiplicity). */
  def loadBucketed(spark: SparkSession, prefix: String,
                   edgesDistinct: Boolean = false): PropertyGraph =
    PropertyGraph(
      spark.table(s"${prefix}_nodes"),
      spark.table(s"${prefix}_edges"),
      edgesDistinct = edgesDistinct,
      edgesRev = Some(spark.table(s"${prefix}_edges_rev")))
}
