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

  private def cut(df: DataFrame, iter: Int): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    // lineage reset: localCheckpoint is eager and truncates the logical plan
    if (iter % 3 == 2) cached.localCheckpoint(true) else cached
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
    var visited = sources.select(col("id")).distinct().withColumn("level", lit(0))
    var frontier = visited
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("level", lit(iter + 1))
      frontier = cut(next, iter)
      if (frontier.isEmpty) done = true
      else visited = cut(visited.unionByName(frontier), iter)
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
    var dist = sources.select(col("id")).distinct().withColumn("dist", lit(0.0))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("id").agg(min("dist").as("dist"))
      val next = cut(relaxed, iter)
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
    var comp = vertices.select(col("id")).distinct().withColumn("component", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val prop = comp.join(und, comp("id") === und("src"))
        .select(col("dst").as("id"), col("component"))
        .unionByName(comp)
        .groupBy("id").agg(min("component").as("component"))
      val next = cut(prop, iter)
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
   * @return (id, rank DOUBLE), ranks sum to ~numVertices
   */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val v = vertices.select(col("id")).distinct().cache()
    val n = v.count()
    // outDeg and links are re-read EVERY iteration (links in the contrib
    // join, outDeg in the dangling-mass probe) — cache both and force
    // materialization now so no iteration re-runs the upstream edge plan.
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).cache()
    val links = edges.select("src", "dst").join(outDeg, col("src") === col("id")).drop("id").cache()
    links.count()
    var ranks = v.withColumn("rank", lit(1.0))
    for (i <- 0 until iters) {
      val contribs = links.join(ranks, links("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
      val totalIn = ranks.join(outDeg, Seq("id"), "left_semi").agg(sum("rank")).first().getDouble(0)
      val danglingMass = n - totalIn // ranks sum to n; non-dangling mass flows via links
      val next = v.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(1 - damping) + lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(danglingMass / n))).as("rank"))
      ranks = cut(next, i)
    }
    ranks
  }
}
