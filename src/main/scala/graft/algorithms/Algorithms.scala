package graft.algorithms

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Iterative graph algorithms over edge DataFrames — the Spark-native story
 * for the reference's "raw kernel programs" entry point (BFS and SSSP as
 * semiring iterations, g4s-sparse/src/test/scala/.../grbv2/DocSpec.scala:31-101).
 *
 * Design for scale: each iteration is a shuffle join + partial aggregation;
 * frontiers/state are cached per iteration and the lineage is cut with
 * `localCheckpoint` every few rounds (the Spark-specific hazard SURVEY §7.4
 * calls out — without it the plan tree doubles per iteration). No driver-side
 * per-row loops; the only driver values are convergence counts.
 */
object Algorithms {

  /**
   * Per-chain iteration-state manager: persists every iteration's state,
   * truncates lineage with an EAGER `localCheckpoint` every `every` rounds,
   * and — because the eager checkpoint materializes the tip into its own
   * RDD blocks — unpersists all older iterations of the chain at that
   * point. Without the unpersist, a k-iteration algorithm leaks k cached
   * DataFrames into executor storage (measured: 18 lingering RDDs after one
   * 10-iteration PageRank), which accumulates across queries in a resident
   * session.
   */
  private final class Cutter(every: Int = 3) {
    private val pending = scala.collection.mutable.Buffer[DataFrame]()
    def apply(df: DataFrame, iter: Int): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      pending += cached
      if (iter % every == every - 1) {
        // eager: computes the chain now; the checkpoint RDD holds the data,
        // so every pending cache entry of this chain is now unreferenced
        val cp = cached.localCheckpoint(true)
        pending.foreach(_.unpersist(false)); pending.clear()
        cp
      } else cached
    }
    // NOTE: up to `every` DataFrames stay persisted at the end of a run —
    // they may back the returned result's lineage. Callers that need a
    // pristine session (Bench) drop scratch caches between queries.
  }

  /**
   * Multi-source BFS levels: frontier ⊕.⊗ adjacency over the (lor, land)
   * semiring ≙ join + distinct (reference DocSpec.scala:31-53).
   *
   * @param edges (src BIGINT, dst BIGINT)
   * @param sources seed vertex ids as a 1-col DataFrame "id"
   * @return (id BIGINT, level INT) — minimum hop count from any source
   */
  def bfs(edges: DataFrame, sources: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst")).cache()
    val cutF = new Cutter; val cutV = new Cutter
    var visited = sources.select(col("id")).distinct().withColumn("level", lit(0))
    var frontier = visited
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("level", lit(iter + 1))
      frontier = cutF(next, iter)
      if (frontier.isEmpty) done = true
      else visited = cutV(visited.unionByName(frontier), iter)
      iter += 1
    }
    visited
  }

  /**
   * Single-source(s) shortest path over (min, plus): iterate
   * `d ← d min.+ A` until fixpoint (reference DocSpec.scala:55-101).
   *
   * @param edges (src, dst, w DOUBLE)
   * @param sources (id) seeds at distance 0
   * @return (id, dist DOUBLE)
   */
  def sssp(edges: DataFrame, sources: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("double")).cache()
    val cutter = new Cutter
    var dist = sources.select(col("id")).distinct().withColumn("dist", lit(0.0))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("id").agg(min("dist").as("dist"))
      val next = cutter(relaxed, iter)
      // fixpoint: no vertex improved (anti-join of new state against old)
      converged = next.alias("n").join(dist.alias("o"), Seq("id"), "left_outer")
        .filter(col("o.dist").isNull || col("n.dist") < col("o.dist"))
        .isEmpty
      dist = next
      iter += 1
    }
    dist
  }

  /**
   * Weakly connected components by iterative min-id propagation (HashMin).
   * Undirected closure = union of both edge orientations.
   *
   * @return (id, component BIGINT = min vertex id in the component)
   */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"))).cache()
    val cutter = new Cutter
    var comp = vertices.select(col("id")).distinct().withColumn("component", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val prop = comp.join(und, comp("id") === und("src"))
        .select(col("dst").as("id"), col("component"))
        .unionByName(comp)
        .groupBy("id").agg(min("component").as("component"))
      val next = cutter(prop, iter)
      converged = next.alias("n").join(comp.alias("o"), Seq("id"))
        .filter(col("n.component") < col("o.component")).isEmpty
      comp = next
      iter += 1
    }
    comp
  }

  /**
   * PageRank, fixed iteration count (deterministic for oracle-less
   * cross-checks). Dangling mass is redistributed uniformly.
   *
   * The dangling-mass term is a 1-row aggregate BROADCAST INTO the plan
   * (crossJoin of a singleton), not a driver-side `.first()`: a per-
   * iteration driver action is a synchronization barrier per round — 10
   * blocking round-trips whose latency (stragglers, CPU steal on shared
   * hosts) adds up; in-plan, the whole chain runs as one job per lineage
   * cut. Only the vertex count and the periodic eager checkpoints touch
   * the driver.
   *
   * @return (id, rank DOUBLE), ranks sum to ~numVertices
   */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val v = vertices.select(col("id")).distinct().cache()
    val n = v.count()
    // outDeg and links are re-read EVERY iteration (links in the contrib
    // join, outDeg in the dangling-mass aggregate) — cache both and force
    // materialization now so no iteration re-runs the upstream edge plan.
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).cache()
    val links = edges.select("src", "dst").join(outDeg, col("src") === col("id")).drop("id").cache()
    links.count()
    val cutter = new Cutter
    var ranks = v.withColumn("rank", lit(1.0))
    for (i <- 0 until iters) {
      val contribs = links.join(ranks, links("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
      // ranks sum to n; non-dangling mass flows via links
      val dangling = ranks.join(outDeg, Seq("id"), "left_semi")
        .agg((lit(n.toDouble) - sum("rank")).as("__dm"))
      val next = v.join(contribs, Seq("id"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(1 - damping) + lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("__dm") / lit(n.toDouble))).as("rank"))
      ranks = cutter(next, i)
    }
    ranks
  }
}
