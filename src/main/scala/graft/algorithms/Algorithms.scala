package graft.algorithms

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.util.CacheLifecycle.releaseOnFirstAction

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

  /** Vertex-count gate for the link predictors' explicit degree-table
    * broadcasts: ≤ 8 M vertices ≈ 128 MB of (id, deg) rows — comfortably
    * within executor/driver broadcast budgets; above it the hint is dropped
    * and AQE picks the join strategy from runtime sizes. */
  private val MaxBroadcastVertices: Long = 8L * 1024 * 1024

  /** Edge-count gate for [[stronglyConnectedComponents]]'s hop augmentation:
    * below it, e² / e³ shortcut edges are cheap accelerators; above it their
    * wedge-quadratic growth would dominate, so propagation stays 1-hop. */
  val SccAugMaxEdges: Long = 1L << 20

  /** Edge-count gate for the driver-local small-graph fast paths
    * ([[connectedComponents]]' union-find, [[stronglyConnectedComponents]]'
    * residual-tail Tarjan): at or below it the edge set collects (≤ ~32 MB
    * of long pairs) and the fixpoint runs in-JVM — the per-round Spark job
    * floor is the whole cost of these loops on distillate-sized graphs
    * (measured: scc at sf0.1 = 252 jobs, 0.7 core-seconds of actual work).
    * Above the gate the distributed loops run unchanged. Labels are
    * identical by construction (component = min member id); equality is
    * spec-pinned on both paths. Overridable per session via
    * `graft.localGraphMaxEdges` (tests force 0 to exercise the
    * distributed path on toy graphs). */
  val LocalGraphMaxEdges: Long = 2L * 1000 * 1000

  /** Vertex/seed-count cap for the driver-local loop gates: collected id
    * arrays stay ≤ ~64 MB. The edge gate alone does not bound the vertex
    * set (a billion isolated vertices over ten edges), so every local path
    * that collects a vertex or seed list checks this too. */
  val LocalGraphMaxVertices: Long = 4L * 1000 * 1000

  /** Row cap for the local per-source BFS state (Σ per-source
    * reachability): past it the local run aborts and the distributed loop
    * — whose state is partitioned and disk-backed — takes over. 2^22 rows
    * of boxed (Long, Long, Int[, Long]) tuples ≈ 200 MB plus the
    * LocalRelation copy `toDF` builds — the budget a default-sized driver
    * actually has (r14's 2^24 allowed ~1 GB+ of driver state, the r14
    * advisory); checked INSIDE the per-source round loop so an
    * over-budget source aborts mid-flood instead of after completing. */
  val LocalStateMaxRows: Long = 1L << 22

  private def localGraphGate(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.localGraphMaxEdges")
      .map(_.toLong).getOrElse(LocalGraphMaxEdges)

  /** The local gates collect ids via getLong — any other id type skips the
    * gate and runs distributed (queries and tests use BIGINT ids; this is
    * the safety net, not a supported alternate path). */
  private def longCols(df: DataFrame, cols: String*): Boolean =
    cols.forall(c => df.schema(c).dataType ==
      org.apache.spark.sql.types.LongType)

  private def collectPairs(df: DataFrame): Array[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))

  private def collectIds(df: DataFrame): Array[Long] =
    df.collect().map(_.getLong(0))

  /** In-JVM union-find over an edge list: label = MIN member id of each
    * component — exactly [[connectedComponents]]' fixpoint labeling.
    * Returns one (id, label) row per distinct endpoint. */
  private[graft] def localComponentLabels(es: Array[(Long, Long)]): Array[(Long, Long)] = {
    val idx = new scala.collection.mutable.LongMap[Int]()
    val ids = scala.collection.mutable.ArrayBuffer[Long]()
    def at(v: Long): Int = idx.getOrElseUpdate(v, { ids += v; ids.length - 1 })
    val parent = scala.collection.mutable.ArrayBuffer[Int]()
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    es.foreach { case (s, d) =>
      val (si, di) = (at(s), at(d))
      while (parent.length < ids.length) parent += parent.length
      val (rs, rd) = (find(si), find(di))
      if (rs != rd) parent(rd) = rs
    }
    while (parent.length < ids.length) parent += parent.length
    val minOf = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    while (i < ids.length) {
      val r = find(i).toLong
      val v = ids(i)
      minOf.updateWith(r)(o => Some(o.fold(v)(math.min(_, v))))
      i += 1
    }
    Array.tabulate(ids.length)(j => (ids(j), minOf(find(j).toLong)))
  }

  /** In-JVM iterative Tarjan: (id, minMemberIdOfItsScc) per vertex. */
  private[graft] def localSccLabels(vs: Array[Long], es: Array[(Long, Long)]): Array[(Long, Long)] = {
    val n = vs.length
    val idx = new scala.collection.mutable.LongMap[Int](n)
    var i = 0
    while (i < n) { idx.put(vs(i), i); i += 1 }
    // CSR adjacency over edges whose BOTH endpoints are known vertices
    val deg = new Array[Int](n)
    es.foreach { case (s, d) =>
      if (idx.contains(s) && idx.contains(d)) deg(idx(s)) += 1 }
    val off = new Array[Int](n + 1)
    i = 0; while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](off(n))
    val fill = off.clone()
    es.foreach { case (s, d) =>
      if (idx.contains(s) && idx.contains(d)) {
        val si = idx(s); adj(fill(si)) = idx(d); fill(si) += 1
      }
    }
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val stack = new scala.collection.mutable.ArrayBuffer[Int]()
    val label = new Array[Long](n)
    var counter = 0
    // explicit DFS stack: (vertex, next child pointer)
    val dfsV = new scala.collection.mutable.ArrayBuffer[Int]()
    val dfsC = new scala.collection.mutable.ArrayBuffer[Int]()
    var root = 0
    while (root < n) {
      if (index(root) < 0) {
        dfsV += root; dfsC += off(root)
        index(root) = counter; low(root) = counter; counter += 1
        stack += root; onStack(root) = true
        while (dfsV.nonEmpty) {
          val v = dfsV.last
          if (dfsC.last < off(v + 1)) {
            val w = adj(dfsC.last)
            dfsC(dfsC.length - 1) += 1
            if (index(w) < 0) {
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack(w) = true
              dfsV += w; dfsC += off(w)
            } else if (onStack(w) && index(w) < low(v)) low(v) = index(w)
          } else {
            dfsV.remove(dfsV.length - 1); dfsC.remove(dfsC.length - 1)
            if (dfsV.nonEmpty && low(v) < low(dfsV.last)) low(dfsV.last) = low(v)
            if (low(v) == index(v)) { // v roots an SCC: pop it, label = min id
              var j = stack.length - 1
              var mn = Long.MaxValue
              while (stack(j) != v) { mn = math.min(mn, vs(stack(j))); j -= 1 }
              mn = math.min(mn, vs(v))
              while (stack.length > j) {
                val w = stack.remove(stack.length - 1)
                onStack(w) = false; label(w) = mn
              }
            }
          }
        }
      }
      root += 1
    }
    Array.tabulate(n)(j => (vs(j), label(j)))
  }

  /**
   * Thrown when an iterative algorithm exhausts its iteration budget before
   * reaching the fixpoint. Silent truncation was round 2's one latent
   * wrong-answer-at-scale defect: a graph deeper than `maxIter` would return
   * whatever partial state existed when the budget ran out — correct on the
   * 3-level test graph, silently wrong on a 64-node chain. Fail loudly
   * instead; callers that genuinely want partial state can catch and retry
   * with a larger budget.
   */
  final class BudgetExhausted(algo: String, maxIter: Int) extends IllegalStateException(
    s"$algo did not converge within maxIter=$maxIter iterations; " +
      s"raise maxIter — partial results would be silently wrong")

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
    // CADENCE IS DELIBERATELY FIXED AND ITER-SYNCHRONIZED. Adaptive
    // cadences keyed to MEASURED lineage size were built and benchmarked
    // in round 13 and every variant regressed, for mechanical reasons
    // worth recording:
    //  - LONGER gaps (cut only when the tip's plan-DAG size crosses a
    //    threshold, ~4-6+ rounds apart): the loop's sibling chain
    //    (visited/state vs frontier) still references the round caches the
    //    cut just dropped (recompute), and every uncut union round adds a
    //    full partition set of map tasks to all downstream scans --
    //    graph_sigma 11.3->16.6 s, bfs_levels 1.8->3.9 s at sf0.1.
    //  - EARLIER cuts on a per-chain growth trigger: the paired Cutters
    //    DESYNCHRONIZE (one cuts at round k, the other at k+2), so each
    //    cut orphans cache entries the sibling's plans still walk --
    //    graph_sigma ~20 s, the whole BFS family +50-70%. The iter-keyed
    //    cadence keeps the pair cutting in the same round, which is what
    //    bounds recompute depth.
    //  - Raw-tree size probes are themselves hazardous: mutually
    //    referencing chains make TreeNode walks exponential in round
    //    count (driver OOM, reproduced).
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
    // Plain-persisted (never checkpointed) tips still pending at the end of
    // a run — up to `every` of them back the returned result's lineage.
    // Each algorithm hands these plus its edge caches to
    // releaseOnFirstAction, so the first caller action runs fully cached
    // and the session is left clean (localCheckpoint blocks are the one
    // exception: lineage-truncated, reclaimed by the ContextCleaner on GC).
    def leftovers: Seq[DataFrame] = pending.toList
  }

  /**
   * Multi-source BFS levels: frontier ⊕.⊗ adjacency over the (lor, land)
   * semiring ≙ join + distinct (reference DocSpec.scala:31-53).
   *
   * @param edges (src BIGINT, dst BIGINT)
   * @param sources seed vertex ids as a 1-col DataFrame "id"
   * @return (id BIGINT, level INT) — minimum hop count from any source
   */
  def bfs(edges: DataFrame, sources: DataFrame, maxIter: Int = 100): DataFrame = {
    val e = edges.select(col("src"), col("dst")).cache()
    // Distillate gate (see [[Local]]): the per-round job floor is the whole
    // cost of this loop on small graphs — collect once, run in-JVM,
    // parallelize the result. Levels are exact integers on both paths.
    if (longCols(e, "src", "dst") && longCols(sources.select(col("id")), "id") &&
        e.count() <= localGraphGate(edges)) {
      val src = sources.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (src.count() <= LocalGraphMaxVertices) {
        val eArr = collectPairs(e)
        val sArr = collectIds(src)
        e.unpersist(false); src.unpersist(false)
        val spark = edges.sparkSession
        import spark.implicits._
        return Local.bfsLevels(eArr, sArr, maxIter).toSeq.toDF("id", "level")
      }
      src.unpersist(false)
    }
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
      // full-materializing count, not isEmpty — see connectedComponents
      if (frontier.count() == 0L) done = true
      else visited = cutV(visited.unionByName(frontier), iter)
      iter += 1
    }
    if (!done) throw new BudgetExhausted("bfs", maxIter)
    releaseOnFirstAction(visited, e +: (cutF.leftovers ++ cutV.leftovers): _*)
  }

  /**
   * Per-source BFS levels: like [[bfs]], but each source tracks its own
   * visited set, so the result is the minimum hop count for every
   * (source, reachable vertex) PAIR — the kernel under Cypher
   * `shortestPath((a)-[:T*]->(b))`. The frontier key is (src, id); at scale
   * the state is O(Σ per-source reachability), the honest cost of all-pairs-
   * from-sources shortest paths — bound the source set, not the algorithm.
   *
   * @param edges (src BIGINT, dst BIGINT)
   * @param sources seed vertex ids as a 1-col DataFrame "id"
   * @return (src BIGINT, id BIGINT, level INT) — level ≥ 1 rows only appear
   *         for vertices actually reached; level 0 rows seed every source
   */
  def bfsPerSource(edges: DataFrame, sources: DataFrame, maxIter: Int = 100): DataFrame = {
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst")).cache()
    // Distillate gate (see [[Local]]): exact integer levels; the local run
    // aborts past [[LocalStateMaxRows]] of (src, id, level) state and falls
    // through to the distributed loop (e stays cached for it).
    if (longCols(e, "e_src", "e_dst") && longCols(sources.select(col("id")), "id") &&
        e.count() <= localGraphGate(edges)) {
      val src = sources.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (src.count() <= LocalGraphMaxVertices) {
        val eArr = collectPairs(e)
        val sArr = collectIds(src)
        src.unpersist(false)
        Local.bfsPerSource(eArr, sArr, maxIter, LocalStateMaxRows) match {
          case Some(arr) =>
            e.unpersist(false)
            val spark = edges.sparkSession
            import spark.implicits._
            return arr.toSeq.toDF("src", "id", "level")
          case None => // state too large for the driver: run distributed
        }
      } else src.unpersist(false)
    }
    val cutF = new Cutter; val cutV = new Cutter
    var visited = sources.select(col("id")).distinct()
      .select(col("id").as("src"), col("id"), lit(0).as("level"))
    var frontier = visited
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = frontier.join(e, frontier("id") === col("e_src"))
        .select(col("src"), col("e_dst").as("id")).distinct()
        .join(visited.select("src", "id"), Seq("src", "id"), "left_anti")
        .withColumn("level", lit(iter + 1))
      frontier = cutF(next, iter)
      // full-materializing count, not isEmpty — see connectedComponents
      if (frontier.count() == 0L) done = true
      else visited = cutV(visited.unionByName(frontier), iter)
      iter += 1
    }
    if (!done) throw new BudgetExhausted("bfsPerSource", maxIter)
    releaseOnFirstAction(visited, e +: (cutF.leftovers ++ cutV.leftovers): _*)
  }

  /**
   * Harmonic centrality over directed edges: H(v) = Σ_{u ≠ v reachable from v}
   * 1 / d(v, u) — the closeness variant that handles disconnected graphs
   * gracefully (unreachable vertices contribute 0 instead of poisoning an
   * average). Built on [[bfsPerSource]]: one BFS state keyed (src, id), one
   * aggregation; seeds are pruned to vertices with an out-edge (the rest
   * score 0 via the final left join instead of carrying dead seed state
   * through every round).
   *
   * At scale the state is O(Σ per-source reachability) — the honest cost of
   * all-sources shortest paths; this exact form is the OPT-IN for graphs
   * small enough to afford it. The scale default is
   * [[harmonicLandmark]]: k sampled landmarks, O(k · reachability) state,
   * unbiased estimate.
   *
   * @param vertices (id) — vertices to report (no out-edges ⇒ 0.0)
   * @param edges (src, dst)
   * @return (id, harmonic DOUBLE)
   */
  def harmonicCentrality(vertices: DataFrame, edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val vs = vertices.select(col("id")).distinct()
    val seeds = vs.join(edges.select(col("src").as("id")), Seq("id"), "left_semi")
    val h = bfsPerSource(edges, seeds, maxIter)
      .filter(col("level") > 0)
      .groupBy(col("src").as("id"))
      .agg(sum(lit(1.0) / col("level")).as("harmonic"))
    vs.join(h, Seq("id"), "left")
      .select(col("id"), coalesce(col("harmonic"), lit(0.0)).as("harmonic"))
  }

  /**
   * Landmark-approximated harmonic centrality — the Eppstein–Wang sampling
   * estimator (SODA'01, closeness variant) applied to H(v) = Σ_{u≠v}
   * 1/d(v,u): sample k landmark TARGETS uniformly and estimate
   *
   *   Ĥ(v) = (n/k) · Σ_{l ∈ L} 1/d(v, l)
   *
   * Each u ∈ V lands in a uniform k-subset L with probability k/n, so
   * E[Σ_{l∈L} 1/d(v,l)] = (k/n)·H(v) (the u = v term contributes 0 — BFS
   * never re-reaches its own seed) — the n/k scale makes it unbiased;
   * variance falls as 1/k.
   *
   * Landmark selection is md5-of-id order (the engine-portable uniform
   * device [[graft.ml.Similarity.ivfCentroids]] uses): deterministic, so an
   * external oracle reproduces the exact sample, and md5 of the decimal id
   * string is agreed byte-for-byte across engines.
   *
   * Mechanics: d(v → l) for ALL v at once = one per-source BFS over the
   * TRANSPOSED edges seeded at the k landmarks (a reversed BFS from l
   * reaches v at level d iff the original graph has a length-d path
   * v → l). State is O(k · reachability) — bounded by construction, the
   * 100×-scale default — vs the exact [[harmonicCentrality]]'s
   * O(Σ per-source reachability).
   *
   * @param vertices (id) — vertices to report (nothing reaches a landmark ⇒ 0.0)
   * @param edges (src, dst)
   * @param k landmark count (clamped to |vertices|; k = n degenerates to
   *          the exact harmonic with scale 1)
   * @return (id, harmonic DOUBLE) — estimate, exact when k = n
   */
  def harmonicLandmark(vertices: DataFrame, edges: DataFrame, k: Int,
                       maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"harmonicLandmark needs k >= 1, got $k")
    val vs = vertices.select(col("id")).distinct()
    // n is needed as a plan scalar for the n/k scale; one vertex-count job.
    // The landmark sample itself is a distributed TakeOrdered (limit k over
    // the md5 order), never a full sort.
    val n = vs.count()
    val kk = math.min(k.toLong, math.max(n, 1L))
    val landmarks = vs
      .select(col("id"), md5(col("id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("id")).limit(kk.toInt).select("id")
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    val h = bfsPerSource(rev, landmarks, maxIter)
      .filter(col("level") > 0) // level-0 seed rows are not distances
      .groupBy(col("id"))
      .agg(sum(lit(1.0) / col("level")).as("hsum"))
    vs.join(h, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("hsum"), lit(0.0)) * lit(n.toDouble / kk)).as("harmonic"))
  }

  /**
   * Landmark-sampled betweenness centrality — Brandes' dependency
   * accumulation (Brandes 2001) run from k deterministically sampled
   * sources, scaled n/k (the Brandes–Pich pivot estimator; unbiased for
   * the source sum). Exact all-sources betweenness is O(n·m) — a
   * non-starter at 100× scale; k landmarks bound the state at
   * O(k · reachability), the same contract as [[harmonicLandmark]], and
   * the md5 sample is deterministic so results stay oracle-checkable.
   *
   * Forward: one multi-source BFS keyed (src, id) carrying σ — the
   * shortest-path count, summed over the level-(L-1) DAG parents (the
   * [[bfsPerSource]] frontier shape plus one aggregate column). Backward:
   * levels descend from the BFS depth; each round joins the current
   * level's dependency δ(w) to its DAG parents p:
   * δ(p) = σ(p) · Σ_w (1 + δ(w)) / σ(w). Rounds = 2 × BFS depth, each a
   * frontier-sized join — no full-graph pass after the BFS itself, and
   * the per-level filters read one cached (src, id, level, σ) state.
   *
   * @param vertices (id) — vertices to report (never interior ⇒ 0.0)
   * @param edges (src, dst) directed
   * @return (id, betweenness DOUBLE)
   */
  def betweennessLandmark(vertices: DataFrame, edges: DataFrame, k: Int,
                          maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"betweennessLandmark needs k >= 1, got $k")
    val vs = vertices.select(col("id")).distinct()
    val n = vs.count()
    if (n == 0) return vs.select(col("id"), lit(0.0).as("betweenness"))
    val kk = math.min(k.toLong, n)
    val landmarks = vs
      .select(col("id"), md5(col("id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("id")).limit(kk.toInt).select("id")
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst")).cache()
    // Distillate gate (see [[Local]]): σ forward pass is exact; the
    // backward δ sums differ only in double-sum order (oracle-verified at
    // round-6). Landmark selection stays the distributed TakeOrdered above
    // — the collected list is ≤ k rows.
    if (longCols(e, "e_src", "e_dst") && longCols(vs, "id") &&
        e.count() <= localGraphGate(edges)) {
      val eArr = collectPairs(e)
      val lArr = collectIds(landmarks)
      e.unpersist(false)
      val spark = vertices.sparkSession
      import spark.implicits._
      val bc = Local.betweennessDeltas(eArr, lArr, maxIter)
        .toSeq.toDF("id", "dsum")
      return vs.join(bc, Seq("id"), "left")
        .select(col("id"),
          (coalesce(col("dsum"), lit(0.0)) * lit(n.toDouble / kk)).as("betweenness"))
    }
    val cutF = new Cutter; val cutV = new Cutter
    var visited = landmarks
      .select(col("id").as("src"), col("id"), lit(0).as("level"), lit(1L).as("sigma"))
    var frontier = visited
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = frontier.join(e, frontier("id") === col("e_src"))
        .select(col("src"), col("e_dst").as("id"), col("sigma"))
        .groupBy("src", "id").agg(sum("sigma").as("sigma"))
        .join(visited.select("src", "id"), Seq("src", "id"), "left_anti")
        .withColumn("level", lit(iter + 1))
      frontier = cutF(next, iter)
      if (frontier.count() == 0L) done = true
      else visited = cutV(visited.unionByName(frontier), iter)
      iter += 1
    }
    if (!done) throw new BudgetExhausted("betweennessLandmark", maxIter)
    val vis = visited.persist(StorageLevel.MEMORY_AND_DISK)
    // max over an EMPTY visited set (zero-vertex graph → no landmarks) is
    // SQL null — treat as level 0 so the all-zeros path below returns the
    // (empty) result instead of an NPE at getInt
    val maxRow = vis.agg(max(col("level"))).head()
    val maxLevel = if (maxRow.isNullAt(0)) 0 else maxRow.getInt(0)
    if (maxLevel == 0) { // no landmark reaches anything: all zeros
      val zero = vs.select(col("id"), lit(0.0).as("betweenness"))
      return releaseOnFirstAction(zero, (e +: vis +: cutF.leftovers): _*)
    }
    val cutB = new Cutter
    var curDelta = vis.filter(col("level") === maxLevel)
      .select(col("src"), col("id"), col("sigma"), lit(0.0).as("delta"))
    val parts = scala.collection.mutable.Buffer[DataFrame]()
    var lvl = maxLevel
    while (lvl >= 1) {
      parts += curDelta.select(col("id"), col("delta"))
      if (lvl > 1) {
        // each w at level lvl sends (1 + δ(w)) / σ(w) along its in-edges;
        // only DAG parents (level lvl-1, same source tree) receive it
        val contrib = curDelta
          .join(e, curDelta("id") === col("e_dst"))
          .select(col("src"), col("e_src").as("id"),
            ((lit(1.0) + col("delta")) / col("sigma")).as("c"))
          .groupBy("src", "id").agg(sum("c").as("csum"))
        val parent = vis.filter(col("level") === lvl - 1)
          .select(col("src"), col("id"), col("sigma"))
        curDelta = cutB(parent.join(contrib, Seq("src", "id"), "left")
          .select(col("src"), col("id"), col("sigma"),
            (coalesce(col("csum"), lit(0.0)) * col("sigma")).as("delta")),
          maxLevel - lvl)
      }
      lvl -= 1
    }
    val bc = parts.reduce(_.unionByName(_))
      .groupBy("id").agg(sum("delta").as("dsum"))
    val result = vs.join(bc, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("dsum"), lit(0.0)) * lit(n.toDouble / kk)).as("betweenness"))
    releaseOnFirstAction(result,
      (e +: vis +: (cutF.leftovers ++ cutV.leftovers ++ cutB.leftovers)): _*)
  }

  /**
   * Maximal independent set by Luby's algorithm (Luby 1986) with
   * DETERMINISTIC per-round md5 priorities standing in for the RNG: each
   * round, an active vertex joins the MIS iff its priority key
   * (md5("round:id") ++ zero-padded id) is a strict minimum over its
   * ACTIVE neighbors (no active neighbor ⇒ trivial winner); winners'
   * neighbors deactivate. Fresh per-round hashes replay Luby's
   * re-randomization, so the expected round count stays O(log n), and the
   * priorities are engine-reproducible — an external oracle unrolls the
   * same rounds (the kcore fixed-unroll device). Each round is two
   * semi-joins + one aggregate + one anti-join over the ACTIVE subgraph —
   * state shrinks geometrically.
   *
   * @param vertices (id) — isolated vertices are always in the MIS
   * @param edges (src, dst), direction ignored, self-loops dropped
   * @return (id, in_mis BOOLEAN) for every vertex
   */
  def maximalIndependentSet(vertices: DataFrame, edges: DataFrame,
                            maxIter: Int = 50): DataFrame = {
    // Distillate gate (see [[Local]]): exact — the per-round md5 priority
    // strings and the strict-min winner rule are replicated byte for byte.
    {
      val e0 = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val vs0 = vertices.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (longCols(e0, "src", "dst") && longCols(vs0, "id") &&
          e0.count() <= localGraphGate(edges) && vs0.count() <= LocalGraphMaxVertices) {
        val eArr = collectPairs(e0)
        val vArr = collectIds(vs0)
        e0.unpersist(false); vs0.unpersist(false)
        val spark = vertices.sparkSession
        import spark.implicits._
        return Local.mis(vArr, eArr, maxIter).toSeq.toDF("id", "in_mis")
      }
      e0.unpersist(false); vs0.unpersist(false)
    }
    val vs = vertices.select(col("id")).distinct().localCheckpoint(true)
    val sym = edges.select("src", "dst").filter(col("src") =!= col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var active = vs
    val winnersAcc = scala.collection.mutable.Buffer[DataFrame]()
    var round = 0
    var budget = maxIter
    var live = active.count()
    while (live > 0) {
      if (budget <= 0) throw new BudgetExhausted("maximalIndependentSet", maxIter)
      budget -= 1; round += 1
      val h = active.withColumn("__k",
        concat(md5(concat_ws(":", lit(round), col("id"))),
          format_string("%020d", col("id")))).localCheckpoint(true)
      val eAct = sym.join(h.select(col("id").as("src")), Seq("src"), "left_semi")
      val nbrMin = eAct
        .join(h.select(col("id").as("dst"), col("__k").as("__nk")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("__nk").as("__nmin"))
      val winners = h.join(nbrMin, Seq("id"), "left")
        .filter(col("__nmin").isNull || col("__k") < col("__nmin"))
        .select("id").localCheckpoint(true)
      val losers = sym.join(winners.select(col("id").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
      winnersAcc += winners
      active = active.join(winners, Seq("id"), "left_anti")
        .join(losers, Seq("id"), "left_anti").localCheckpoint(true)
      live = active.count()
    }
    val mis = winnersAcc.reduceOption(_.unionByName(_)).getOrElse(vs.filter(lit(false)))
    vs.join(mis.withColumn("in_mis", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("in_mis"), lit(false)).as("in_mis"))
  }

  /**
   * Multi-source BFS carrying shortest-path COUNTS — the σ table of
   * Brandes' algorithm exposed as its own operator: for each source s and
   * each reachable vertex v, the hop distance and the number of distinct
   * shortest s→v paths. σ sums over the level-(L−1) DAG parents inside the
   * frontier aggregation, so the per-round cost is one frontier-sized join
   * + partial sum — identical plan shape to [[bfsPerSource]] plus one
   * aggregate column (and the same forward pass [[betweennessLandmark]]
   * runs before its dependency sweep).
   *
   * @param edges (src, dst) directed
   * @param sources seed vertices (σ(s, s) = 1 at level 0)
   * @return (src, id, level INT, sigma BIGINT)
   */
  def shortestPathCounts(edges: DataFrame, sources: DataFrame,
                         maxIter: Int = 100): DataFrame = {
    // Distillate gate (see [[Local]]): σ is an exact long sum on both
    // paths. This replaces round 13's withLoopWidth narrow-shuffle device
    // (and its session-conf mutation, the round-13 advisory): the regime
    // where the narrow width won — tiny per-round sigma tables — is
    // exactly the at-or-under-gate regime that now runs in-JVM, and above
    // the gate the data-sized width equaled the session width anyway.
    // persist-then-count (the CC device, r15): the gate count doubles as the
    // cache fill, the local path collects FROM the cache, and the
    // distributed loop's pre-partitioned edge cache repartitions from it —
    // one evaluation of the (often expensive: a lineitem self-join at the
    // graph_sigma call site) edge derivation instead of two (three when the
    // gate failed). r14 counted the RAW derivation here, unlike every other
    // gate — the graph_sigma remaining cost was exactly that second pass.
    val e0 = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eCount = e0.count()
    if (longCols(e0, "src", "dst") &&
        longCols(sources.select(col("id")), "id") &&
        eCount <= localGraphGate(edges)) {
      val src = sources.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (src.count() <= LocalGraphMaxVertices) {
        val eArr = collectPairs(e0)
        val sArr = collectIds(src)
        src.unpersist(false)
        Local.sigmaCounts(eArr, sArr, maxIter, LocalStateMaxRows) match {
          case Some(arr) =>
            e0.unpersist(false)
            val spark = edges.sparkSession
            import spark.implicits._
            return arr.toSeq.toDF("src", "id", "level", "sigma")
          case None => // state too large for the driver: run distributed
        }
      } else src.unpersist(false)
    }
    // cached PRE-PARTITIONED on the join key: every round's expansion join
    // then reads e exchange-free from cache (InMemoryRelation preserves
    // outputPartitioning) instead of re-shuffling the full edge table once
    // per level (filled from the e0 cache — no second derivation pass;
    // e0 is released with the other scratch caches on the first action)
    val e = e0.select(col("src").as("e_src"), col("dst").as("e_dst"))
      .repartition(col("e_src")).cache()
    val cutF = new Cutter; val cutV = new Cutter
    var visited = sources.select(col("id")).distinct()
      .select(col("id").as("src"), col("id"), lit(0).as("level"), lit(1L).as("sigma"))
    var frontier = visited
    // NOTE an explicit broadcast(frontier) hint here was measured and
    // REJECTED: each round then pays a driver collect + broadcast rebuild
    // of the frontier, while the shuffled join it replaces moves only the
    // cached 32-partition edge table — graph_sigma 11.9 → 17-22 s at
    // sf0.1. AQE already broadcast-converts when runtime sizes favor it.
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = frontier.join(e, frontier("id") === col("e_src"))
        .select(col("src"), col("e_dst").as("id"), col("sigma"))
        .groupBy("src", "id").agg(sum("sigma").as("sigma"))
        .join(visited.select("src", "id"), Seq("src", "id"), "left_anti")
        .withColumn("level", lit(iter + 1))
        .select("src", "id", "level", "sigma")
      frontier = cutF(next, iter)
      if (frontier.count() == 0L) done = true
      else visited = cutV(visited.unionByName(frontier), iter)
      iter += 1
    }
    if (!done) throw new BudgetExhausted("shortestPathCounts", maxIter)
    releaseOnFirstAction(visited, e +: (cutF.leftovers ++ cutV.leftovers): _*)
  }

  /**
   * Single-source(s) shortest path over (min, plus): frontier-based
   * Bellman–Ford (reference DocSpec.scala:55-101 iterates the full
   * `d ← d min.+ A` product; the frontier form reaches the same fixpoint
   * relaxing only edges out of vertices that improved last round — round 2
   * re-joined the ENTIRE distance vector against the ENTIRE edge table
   * every iteration AND paid a separate convergence anti-join per round,
   * 3× the join work on a 3-level graph; here an empty improved-set IS the
   * convergence signal, no extra probe).
   *
   * @param edges (src, dst, w DOUBLE)
   * @param sources (id) seeds at distance 0
   * @return (id, dist DOUBLE)
   */
  def sssp(edges: DataFrame, sources: DataFrame, maxIter: Int = 100): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w")).cache()
    // Distillate gate (see [[Local]]): bit-exact — every kept distance is
    // produced by the identical `dist + w` relaxation on both paths, and
    // min is order-free.
    if (longCols(e, "src", "dst") && longCols(sources.select(col("id")), "id") &&
        e.count() <= localGraphGate(edges)) {
      val src = sources.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (src.count() <= LocalGraphMaxVertices) {
        // NULL weights fall through to the distributed loop: its semantics
        // (dist + null → null, nulls dropped by min over mixed groups, a
        // null dist row for null-only-reachable vertices) are not worth
        // replicating in-JVM, and r14's getDouble here CRASHED on them —
        // same input must behave identically above and below the gate
        // (r15 advisory fix)
        val rows = e.collect()
        if (rows.forall(r => !r.isNullAt(2))) {
          val eArr = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          val sArr = collectIds(src)
          e.unpersist(false); src.unpersist(false)
          val spark = edges.sparkSession
          import spark.implicits._
          return Local.sssp(eArr, sArr, maxIter).toSeq.toDF("id", "dist")
        }
      }
      src.unpersist(false)
    }
    val cutD = new Cutter; val cutF = new Cutter
    var dist = sources.select(col("id")).distinct().withColumn("dist", lit(0.0))
    var frontier = dist
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
      val improved = cand.join(dist, Seq("id"), "left_outer")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("id"), col("nd").as("dist"))
      frontier = cutF(improved, iter)
      // full-materializing count, not isEmpty — see connectedComponents
      if (frontier.count() == 0L) converged = true
      else dist = cutD(dist.join(frontier.select("id"), Seq("id"), "left_anti")
        .unionByName(frontier), iter)
      iter += 1
    }
    if (!converged) throw new BudgetExhausted("sssp", maxIter)
    releaseOnFirstAction(dist, e +: (cutD.leftovers ++ cutF.leftovers): _*)
  }

  /**
   * Weakly connected components by alternating large-star/small-star
   * contraction — O(log n) rounds regardless of graph diameter (the
   * published MapReduce connected-components algorithm; round 2's HashMin
   * needed O(diameter) rounds, so a 64-node chain already exhausted the
   * budget).
   *
   * Edges are kept oriented (hi → lo); each round is two shuffle
   * (groupBy + join) steps:
   *  - large-star: for each node u, re-point every neighbor v > u at
   *    m = min(Γ(u) ∪ {u})
   *  - small-star: orient edges hi→lo, group by the hi endpoint, connect
   *    u and all its (smaller) neighbors to m = min(Γ⁻(u) ∪ {u})
   * At the fixpoint the edge set is a disjoint union of stars centered at
   * each component's minimum id.
   *
   * @return (id, component BIGINT = min vertex id in the component) for
   *         every id in `vertices`
   */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // Eager localCheckpoint at entry AND per iteration — not the every-3
    // Cutter cadence the frontier algorithms use. CC is the one algorithm
    // routinely fed a deep upstream plan (an LSH dedup pipeline's pair
    // table): until a checkpoint lands, EVERY action here re-walks that
    // full analyzed tree driver-side (cache-lookup sameResult checks +
    // re-analysis), which measured 40+ s of jobless driver gaps on the
    // minhash pair graph — 10× the actual cluster work. Rooting each round
    // at a leaf RDD makes per-round planning O(one round's 7 operators),
    // and the materialization is not extra work: the set-equality
    // convergence check needs the full edge set each round anyway. The
    // checkpoint blocks of dropped rounds are reclaimed by the
    // ContextCleaner as references lapse.
    // persist-then-count: the count doubles as the cache fill AND the gate
    // probe, and on the (common) local path the collect reads the cache —
    // one materialization pass total. r13 checkpointed BEFORE the gate,
    // paying an extra eager materialization job per call on the local path
    // (wcc_apply and the dedup cluster family each call CC twice).
    val e0 = edges.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Distillate gate: CC is routinely fed a SMALL edge set (an LSH dedup's
    // pair table, a delta-contracted graph) where the per-round job floor
    // of the star-contraction loop is the entire cost. At or below the
    // gate, collect the cached edge set (≤ ~32 MB) and run the union-find
    // in-JVM — identical min-id labels, one job instead of 2×rounds.
    // `vertices` stays distributed either way (only the edge-induced
    // labeling collects).
    val eCount = e0.count()
    if (eCount <= localGraphGate(edges) && longCols(e0, "src", "dst")) {
      val arr = collectPairs(e0.select(col("src"), col("dst")))
      e0.unpersist(false)
      val spark = vertices.sparkSession
      import spark.implicits._
      val labels = localComponentLabels(arr).toSeq.toDF("id", "component")
      return vertices.select(col("id")).distinct()
        .join(labels.filter(col("id") =!= col("component")), Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    }
    // distributed loop: root the rounds at a lineage-free leaf (per-round
    // planning over a deep upstream tree was the r13 finding — 40+ s of
    // driver gaps on the minhash pair graph); the checkpoint reads the
    // cache, so this adds no second pass over the derivation
    var e = e0.localCheckpoint(true)
    e0.unpersist(false)
    var iter = 0
    var converged = eCount == 0L
    while (iter < maxIter && !converged) {
      // large-star over the symmetrized neighborhood
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val lsMin = sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      val ls = sym.join(lsMin, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      // small-star over the hi→lo orientation (large-star output is hi→lo
      // already: m ≤ u < v for every emitted (v, m))
      val ssMin = ls.groupBy("src").agg(min("dst").as("m")) // all dst < src
      val withMin = ls.join(ssMin, "src")
      val ss = withMin.select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(withMin.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val next = ss.localCheckpoint(true)
      // set equality as ONE job: both multiset differences unioned (both
      // sides are distinct, so empty symmetric difference ⇔ equal sets);
      // both sides are checkpointed leaves, so this is a tiny-plan job
      converged = next.exceptAll(e).unionByName(e.exceptAll(next)).count() == 0L
      e = next
      iter += 1
    }
    if (!converged) throw new BudgetExhausted("connectedComponents", maxIter)
    // fixpoint = disjoint stars: one (v, componentMin) edge per non-root v
    vertices.select(col("id")).distinct()
      .join(e.select(col("src").as("id"), col("dst").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /**
   * Per-vertex triangle count over an undirected simple graph.
   *
   * Plan shape (the standard distributed wedge-closure join, not a matrix
   * cube): canonicalize each edge to lo→hi once, so every triangle
   * {a < b < c} is counted exactly once as the wedge a→b→c closed by a→c —
   * two shuffle joins on single keys plus one semi-join on the (x, z) pair,
   * no squaring of the adjacency matrix and no all-pairs anywhere. The wedge
   * table is the scale hazard (Σ deg²); at 100× the canonical orientation
   * keeps it bounded by ordering wedges through the middle vertex, the same
   * reason the classic MapReduce algorithm survives power-law graphs.
   *
   * @param vertices (id) — vertices to report (isolated ⇒ 0)
   * @param edges (src, dst), direction ignored, self-loops dropped
   * @return (id, triangles BIGINT)
   */
  def triangleCount(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges).cache()
    val tri = triangles(e)
    val perV = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    releaseOnFirstAction(
      vertices.select(col("id")).distinct()
        .join(perV, Seq("id"), "left")
        .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles")),
      e)
  }

  /**
   * Local clustering coefficient: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
   * 0 for degree < 2. Same wedge-closure core as [[triangleCount]] plus one
   * degree aggregation over the symmetrized edge set.
   *
   * @return (id, degree BIGINT, lcc DOUBLE)
   */
  def clusteringCoefficient(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges).cache()
    val deg = e.select(col("a").as("id")).unionByName(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val perV = triangles(e).select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    releaseOnFirstAction(
      vertices.select(col("id")).distinct()
        .join(deg, Seq("id"), "left").join(perV, Seq("id"), "left")
        .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree"),
          when(coalesce(col("degree"), lit(0L)) < 2, lit(0.0))
            .otherwise(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
              (col("degree") * (col("degree") - lit(1)))).as("lcc")),
      e)
  }

  /** Degree at or above which a common-neighbor key counts as a hub and its
    * wedge pairs are generated via per-key block decomposition instead of a
    * single join partition (4096² ≈ 16.7 M pairs is where one straggler
    * partition starts to dominate a stage). */
  private val HubDegree = 4096L

  /**
   * All wedge triples (u, v, deg_w) with u < v through a common neighbor w,
   * from a symmetrized incidence list `sym(w, n)` and a degree table
   * `deg(w, deg)` — the shared pair-generation core of [[adamicAdar]] and
   * [[neighborhoodJaccard]].
   *
   * Skew device: keys with deg(w) ≥ `hubDeg` would put deg² pair-rows in a
   * single join partition (a power-law hub at deg 10⁶ is 10¹² pairs — AQE's
   * skew split only repartitions INPUT rows, it cannot split the output
   * explosion of one key). Hub keys instead take a per-key block
   * decomposition (the [[graft.ml.Similarity.nearDupPairs]] triangle-combo
   * device applied per key): each hub adjacency is hashed into `blocks`
   * buckets and every unordered bucket pair joins separately, so a hub's
   * pairs spread over `blocks` shuffle keys at the cost of replicating its
   * incidence rows (blocks+1)/2 times. Cold keys keep the plain self-join —
   * no replication, no extra shuffle.
   */
  private def wedgeTriples(sym: DataFrame, deg: DataFrame, degHint: DataFrame => DataFrame,
                           hubDeg: Long, blocks: Int, maxDeg: Long): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val inc = sym.join(degHint(deg), "w")
    // the caller measured the max degree in the same job as the broadcast
    // gate: with no hub anywhere, skip the hot branch entirely — no filter,
    // no second scan of the incidence join, no empty union leg
    if (maxDeg < hubDeg)
      return inc.as("l")
        .join(inc.as("r"), col("l.w") === col("r.w") && col("l.n") < col("r.n"))
        .select(col("l.n").as("u"), col("r.n").as("v"), col("l.deg").as("wdeg"))
    val cold = inc.filter(col("deg") < hubDeg)
    val hot = inc.filter(col("deg") >= hubDeg)
    val coldPairs = cold.as("l")
      .join(cold.as("r"), col("l.w") === col("r.w") && col("l.n") < col("r.n"))
      .select(col("l.n").as("u"), col("r.n").as("v"), col("l.deg").as("wdeg"))
    // unordered block pairs, orientation alternated for balance (each cross
    // pair lands in exactly one combo row; diagonal combos keep n_l < n_r)
    val combos = (for { i <- 0 until blocks; j <- i until blocks } yield
      if ((i + j) % 2 == 0) (i, j) else (j, i)).toDF("bx", "cby")
    val hl = hot.select(col("w"), col("n").as("ln"), col("deg"),
      pmod(xxhash64(col("n")), lit(blocks)).cast("int").as("bx"))
    val hr = hot.select(col("w").as("rw"), col("n").as("rn"),
      pmod(xxhash64(col("n")), lit(blocks)).cast("int").as("rby"))
    val hotPairs = hl.join(broadcast(combos), Seq("bx"))
      .join(hr, col("w") === col("rw") && col("cby") === col("rby"))
      .filter((col("bx") =!= col("rby") && col("ln") =!= col("rn")) ||
              (col("bx") === col("rby") && col("ln") < col("rn")))
      .select(least(col("ln"), col("rn")).as("u"),
        greatest(col("ln"), col("rn")).as("v"), col("deg").as("wdeg"))
    coldPairs.unionByName(hotPairs)
  }

  /**
   * Adamic–Adar link-prediction scores for NON-adjacent vertex pairs:
   * score(u,v) = Σ_{w ∈ Γ(u)∩Γ(v)} 1 / ln(deg w). The classic
   * common-neighbor measure, routed through each shared neighbor w — one
   * self-join of the symmetrized incidence list keyed on w (never an
   * all-pairs product), then an anti-join drops already-connected pairs.
   * At scale the join fan-out is Σ deg(w)², the same wedge bound as
   * [[triangleCount]]; power-law hubs take the [[wedgeTriples]] per-key
   * block decomposition, everything else the plain self-join.
   *
   * EAGER AT CALL TIME: the broadcast/hub gate runs one Spark job (a
   * 2-scalar agg over the persisted degree table) before returning, so this
   * is NOT a lazy plan-construction call — callers that build DataFrames
   * ahead of execution pay that job and hold the persisted deg table until
   * the first action releases it (or the expiry budget does,
   * [[graft.util.CacheLifecycle]]). The gate must be a measured number: a
   * static guess either mis-broadcasts a huge vertex set or forfeits the
   * broadcast on every small one. Same contract in [[neighborhoodJaccard]].
   *
   * @return (u, v, score DOUBLE) with u < v, only pairs with ≥1 common neighbor
   */
  def adamicAdar(edges: DataFrame, hubDeg: Long = HubDegree, blocks: Int = 8): DataFrame = {
    val e = canonicalEdges(edges).cache()
    val sym = e.select(col("a").as("w"), col("b").as("n"))
      .unionByName(e.select(col("b").as("w"), col("a").as("n")))
    // deg is vertex-sized but derives from sym (no size stats), so the
    // static planner would sort-merge — broadcast it explicitly so the
    // incidence list isn't sorted before the wedge self-join re-sorts it by
    // w anyway. The hint is GATED on a measured vertex count: a tractable
    // Σ deg² pair table does NOT bound the vertex count (1 B vertices of
    // degree ~2 has a modest wedge table but a deg table far past any
    // broadcast limit), so above the gate we fall back to a shuffle join
    // and let AQE size it. deg is persisted — the count and the join share
    // one computation — and released with the rest of the scratch.
    val deg = sym.groupBy("w").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one gate job reads both the vertex count (broadcast gate) and the max
    // degree (hub-path gate) off the persisted degree table
    val gate = deg.agg(count(lit(1)).as("nv"), max(col("deg")).as("md")).first()
    val (nV, maxDeg) = (gate.getLong(0), if (gate.isNullAt(1)) 0L else gate.getLong(1))
    val degHint: DataFrame => DataFrame =
      if (nV <= MaxBroadcastVertices) broadcast(_) else identity
    val pairs = wedgeTriples(sym, deg, degHint, hubDeg, blocks, maxDeg)
      .select(col("u"), col("v"), (lit(1.0) / log(col("wdeg"))).as("s"))
      .groupBy("u", "v").agg(sum("s").as("score"))
    releaseOnFirstAction(
      pairs.join(e, pairs("u") === e("a") && pairs("v") === e("b"), "left_anti"), e, deg)
  }

  /**
   * Neighborhood-overlap (Jaccard) link prediction for NON-adjacent vertex
   * pairs: score(u,v) = |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|. Same shared-neighbor
   * join shape as [[adamicAdar]] — one self-join of the symmetrized
   * incidence list keyed on the common neighbor (never all-pairs), one
   * degree aggregate, an anti-join dropping already-connected pairs. The
   * union size comes from inclusion–exclusion (du + dv − inter), so no
   * second pair join is needed. Σ deg² wedge bound; AQE splits hub skew.
   *
   * @return (u, v, score DOUBLE) with u < v, only pairs with ≥1 common neighbor
   */
  def neighborhoodJaccard(edges: DataFrame, hubDeg: Long = HubDegree, blocks: Int = 8): DataFrame = {
    val e = canonicalEdges(edges).cache()
    val sym = e.select(col("a").as("w"), col("b").as("n"))
      .unionByName(e.select(col("b").as("w"), col("a").as("n")))
    // the wedge pair generation (hub-salted, shared with adamicAdar) carries
    // the O(Σ deg²) pair table; the vertex-count-sized degree table attaches
    // afterwards as two EXPLICIT broadcast joins (deg derives from sym, so
    // the static optimizer has no size stats and would otherwise sort-merge
    // the big side twice). Gated on a measured vertex count, as in
    // [[adamicAdar]]: a tractable pair table does not bound the vertex
    // count, so above the gate fall back to shuffle joins and let AQE size
    // them.
    val deg = sym.groupBy(col("n").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gate = deg.agg(count(lit(1)).as("nv"), max(col("deg")).as("md")).first()
    val (nV, maxDeg) = (gate.getLong(0), if (gate.isNullAt(1)) 0L else gate.getLong(1))
    val degHint: DataFrame => DataFrame =
      if (nV <= MaxBroadcastVertices) broadcast(_) else identity
    val inter = wedgeTriples(sym, deg.select(col("id").as("w"), col("deg")), degHint,
        hubDeg, blocks, maxDeg)
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(degHint(deg.select(col("id").as("u"), col("deg").as("du"))), "u")
      .join(degHint(deg.select(col("id").as("v"), col("deg").as("dv"))), "v")
      .select(col("u"), col("v"),
        (col("inter") / (col("du") + col("dv") - col("inter"))).as("score"))
    releaseOnFirstAction(
      scored.join(e, scored("u") === e("a") && scored("v") === e("b"), "left_anti"), e, deg)
  }

  /**
   * k-core membership: the maximal subgraph where every vertex has degree
   * ≥ k, by synchronous peeling — each round drops all vertices currently
   * under degree k and the edges touching them, until nothing changes.
   * Rounds are bounded by the peel depth (≤ degeneracy ordering length),
   * not the diameter; each round is one degree aggregation + two semi-joins.
   * Peeling only removes edges (pruned ⊆ e), so fixpoint ⇔ the edge COUNT
   * is unchanged — the per-round `count()` on the freshly-persisted state
   * doubles as the convergence probe AND fully populates its cache before
   * the next round references it 4× (degree union twice, both semi-joins);
   * an `exceptAll` probe would shuffle both full edge sets every round for
   * the same answer.
   *
   * DEGREE-DELTA peeling (maintain degrees incrementally, subtract dropped
   * edges' endpoint contributions, anti-join-prune by the removed set) was
   * BUILT, MEASURED and REJECTED in round 14: identical results (parity
   * suite green), but the extra per-round machinery (eager removed-set
   * checkpoint + count, tagged left joins, delta aggregation, a second
   * lineage-cut chain) made the forced-distributed loop 1.7× SLOWER at
   * sf0.1 (7.65 → 13.0 s) and showed no gain at sf1, where the co-supply
   * derivation dominates and the loop itself is distillate-sized (local
   * gate). The regime where fewer shuffled degree bytes could win (sf10+,
   * r13 telemetry 6,647 core-s) needs a measured experiment this sandbox
   * could not run to completion; do not re-land the delta loop without one.
   *
   * @return (id) — vertices of the k-core
   */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    val cutter = new Cutter
    var e = cutter(canonicalEdges(edges), 0)
    var n = e.count()
    // Distillate gate (see [[Local]]): exact synchronous peel, round for
    // round (same convergence and budget behavior).
    if (longCols(e, "a", "b") && n <= localGraphGate(edges)) {
      val eArr = collectPairs(e)
      cutter.leftovers.foreach(_.unpersist(false))
      val spark = edges.sparkSession
      import spark.implicits._
      return Local.kCore(eArr, k, maxIter).toSeq.toDF("id")
    }
    var iter = 0
    var converged = n == 0
    while (iter < maxIter && !converged) {
      val alive = e.select(col("a").as("id")).unionByName(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("id")
      val pruned = e
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
      val next = cutter(pruned, iter + 1)
      val m = next.count()
      converged = m == n
      e = next
      n = m
      iter += 1
    }
    if (!converged) throw new BudgetExhausted("kCore", maxIter)
    // every k-core vertex (k ≥ 1) is incident to a surviving edge
    releaseOnFirstAction(
      e.select(col("a").as("id")).unionByName(e.select(col("b").as("id"))).distinct(),
      cutter.leftovers: _*)
  }

  /**
   * k-truss: the maximal subgraph where every edge participates in at
   * least k−2 triangles — the EDGE-cohesion analogue of [[kCore]]'s vertex
   * degree peel, and the standard community-core extractor one step
   * stronger than k-core (a k-truss is always inside the (k−1)-core).
   * Synchronous peel: each round computes per-edge triangle support via a
   * common-neighbor join and drops every edge under k−2, until the edge
   * count is stable.
   *
   * Each round is one wedge-shaped join (edge endpoints' neighbor lists
   * matched on the shared neighbor) — Σ deg² work like [[triangleCount]],
   * the honest cost of support counting; rounds are bounded by the peel
   * depth. Hub posture matches the link predictors' wedge discussion: a
   * power-law hub makes the support join skew-heavy, and AQE's skew-join
   * split is the mitigation at scale (the per-key block decomposition is
   * not replicated here because the peel re-derives supports every round —
   * salting would have to be re-applied per round for a marginal win).
   *
   * @param edges (src, dst), direction ignored, self-loops dropped
   * @return surviving canonical edges (a, b) with a < b
   */
  def kTruss(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 2, s"k-truss needs k >= 2, got $k")
    val cutter = new Cutter
    var e = cutter(canonicalEdges(edges), 0)
    var n = e.count()
    // Distillate gate (see [[Local]]): exact synchronous support peel,
    // round for round.
    if (longCols(e, "a", "b") && n <= localGraphGate(edges)) {
      val eArr = collectPairs(e)
      cutter.leftovers.foreach(_.unpersist(false))
      val spark = edges.sparkSession
      import spark.implicits._
      return Local.kTruss(eArr, k, maxIter).toSeq.toDF("a", "b")
    }
    var iter = 0
    var converged = n == 0
    while (iter < maxIter && !converged) {
      val nbr = e.select(col("a").as("v"), col("b").as("n"))
        .unionByName(e.select(col("b").as("v"), col("a").as("n")))
      // support(a,b) = |N(a) ∩ N(b)|: both endpoints' neighbor lists joined
      // on the common neighbor; edges with zero support produce no row and
      // drop implicitly (0 < k-2 for every legal k when k > 2; k = 2 keeps
      // every edge and converges immediately)
      val sup = e.as("e")
        .join(nbr.as("x"), col("e.a") === col("x.v"))
        .join(nbr.as("y"), col("e.b") === col("y.v") && col("x.n") === col("y.n"))
        .groupBy(col("e.a").as("a"), col("e.b").as("b"))
        .agg(count(lit(1)).as("sup"))
      val pruned =
        if (k == 2) e
        else sup.filter(col("sup") >= k - 2).select("a", "b")
      val next = cutter(pruned, iter + 1)
      val m = next.count()
      converged = m == n
      e = next
      n = m
      iter += 1
    }
    if (!converged) throw new BudgetExhausted("kTruss", maxIter)
    releaseOnFirstAction(e, cutter.leftovers: _*)
  }

  /**
   * Synchronous label propagation (community detection) with a FIXED round
   * count: every round, each vertex adopts the most frequent label among
   * its neighbors, ties broken toward the SMALLEST label; vertices with no
   * neighbors keep their current label. Labels initialize to the vertex id.
   *
   * Deliberately synchronous + fixed-round: async LPA (and convergence-
   * stopped sync LPA, which can oscillate on bipartite structures) is
   * run-order-dependent; this variant is deterministic, re-runnable, and
   * oracle-comparable. Each round is two shuffles — a neighbor-label count
   * (map-side combinable) and a `max_by` argmax per vertex — over the
   * symmetrized edge set, cached once.
   *
   * @param vertices (id) — vertices to report
   * @param edges (src, dst), direction ignored, self-loops dropped
   * @return (id, community BIGINT)
   */
  def labelPropagation(vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val cutter = new Cutter
    val e0 = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .select(col("src").as("id"), col("dst").as("nb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Distillate gate (see [[Local]]): exact integer argmax with the same
    // (count desc, label asc) tie-break, round for round.
    if (longCols(sym, "id", "nb") &&
        longCols(vertices.select(col("id")), "id") &&
        sym.count() <= localGraphGate(edges)) {
      val vsD = vertices.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (vsD.count() <= LocalGraphMaxVertices) {
        val eArr = collectPairs(sym)
        val vArr = collectIds(vsD)
        sym.unpersist(false); vsD.unpersist(false)
        val spark = vertices.sparkSession
        import spark.implicits._
        return Local.lpa(vArr, eArr, iters).toSeq.toDF("id", "community")
      }
      vsD.unpersist(false)
    }
    var labels = cutter(vertices.select(col("id")).distinct()
      .withColumn("lab", col("id")), 0)
    for (i <- 1 to iters) {
      val cnt = sym.join(labels.select(col("id").as("nb"), col("lab")), "nb")
        .groupBy("id", "lab").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): max of (c, −lab) lexicographically
      val picked = cnt.groupBy("id")
        .agg(max_by(col("lab"), struct(col("c"), (-col("lab")).as("t"))).as("new_lab"))
      labels = cutter(labels.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lab"), col("lab")).as("lab")), i)
    }
    releaseOnFirstAction(labels.select(col("id"), col("lab").as("community")),
      sym +: cutter.leftovers: _*)
  }

  /** lo→hi canonical orientation, self-loops dropped, deduped. */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** Ordered triangles (x < y < z) of a canonical lo→hi edge set. */
  private def triangles(e: DataFrame): DataFrame = {
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    wedges.join(e, wedges("x") === e("a") && wedges("z") === e("b"), "left_semi")
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
    // the edge derivation can be expensive (a lineitem self-join at the
    // call sites) — persist it ONCE; the gate count doubles as the cache
    // fill, and the distributed path's outDeg/links then both read the
    // cache instead of re-running the derivation (it ran twice before)
    val e0 = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val m = e0.count()
    // Distillate gate (see [[Local]]): same iteration, same dangling-mass
    // formula; double-sum order differs (as it already does between Spark's
    // own partial aggregates and the oracle) — parity spec-pinned at 1e-12
    // and oracle-verified at round-6.
    if (longCols(e0, "src", "dst") && longCols(v, "id") &&
        m <= localGraphGate(edges) && n <= LocalGraphMaxVertices) {
      val eArr = collectPairs(e0)
      val vArr = collectIds(v)
      e0.unpersist(false); v.unpersist(false)
      val spark = vertices.sparkSession
      import spark.implicits._
      return Local.pageRank(vArr, eArr, iters, damping).toSeq.toDF("id", "rank")
    }
    val outDeg = e0.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).cache()
    val links = e0.select("src", "dst").join(outDeg, col("src") === col("id")).drop("id").cache()
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
    releaseOnFirstAction(ranks, Seq(v, e0, outDeg, links) ++ cutter.leftovers: _*)
  }

  /**
   * Edge-weighted PageRank: the walker at u follows edge (u, v, w) with
   * probability w / Σ w(u, ·) — the importance flow every co-occurrence /
   * affinity graph wants (an edge seen 50× should carry 50× the mass of a
   * singleton), degenerating exactly to [[pageRank]] on uniform weights.
   * Vertices whose outgoing weight sums to 0 (or with no out-edges) are
   * dangling and redistribute uniformly, as in the unweighted form. Same
   * plan shape and determinism contract: links/out-weights cached once,
   * the dangling mass a broadcast singleton, fixed iterations → unrolled
   * oracle.
   *
   * @param edges (src, dst, w) — w coerced to double; non-positive total
   *              out-weight makes the source dangling
   * @return (id, rank DOUBLE), ranks sum to ~|V|
   */
  def pageRankWeighted(vertices: DataFrame, edges: DataFrame,
                       iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val v = vertices.select(col("id")).distinct().cache()
    val n = v.count()
    // persist the (possibly expensive) weighted edge derivation once — the
    // gate count fills the cache, outW/links read it (see [[pageRank]])
    val e0 = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = e0.count()
    // Distillate gate (see [[Local]]): same iteration and dangling rule
    // (wsum ≤ 0 ⇒ dangling); double-sum order parity as in [[pageRank]].
    if (longCols(e0, "src", "dst") && longCols(v, "id") &&
        m <= localGraphGate(edges) && n <= LocalGraphMaxVertices) {
      // NULL weights fall through to the distributed loop (see [[sssp]]'s
      // gate — r14's getDouble here crashed on a null the distributed path
      // null-propagates through its sums; r15 advisory fix)
      val rows = e0.collect()
      if (rows.forall(r => !r.isNullAt(2))) {
        val eArr = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val vArr = collectIds(v)
        e0.unpersist(false); v.unpersist(false)
        val spark = vertices.sparkSession
        import spark.implicits._
        return Local.pageRankWeighted(vArr, eArr, iters, damping).toSeq.toDF("id", "rank")
      }
    }
    val outW = e0.select(col("src"), col("w"))
      .groupBy(col("src").as("id")).agg(sum("w").as("wsum"))
      .filter(col("wsum") > 0).cache()
    val links = e0.select(col("src"), col("dst"), col("w"))
      .join(outW, col("src") === col("id")).drop("id").cache()
    links.count()
    val cutter = new Cutter
    var ranks = v.withColumn("rank", lit(1.0))
    for (i <- 0 until iters) {
      val contribs = links.join(ranks, links("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") * col("w") / col("wsum")).as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
      val dangling = ranks.join(outW, Seq("id"), "left_semi")
        .agg((lit(n.toDouble) - sum("rank")).as("__dm"))
      val next = v.join(contribs, Seq("id"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(1 - damping) + lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
            col("__dm") / lit(n.toDouble))).as("rank"))
      ranks = cutter(next, i)
    }
    releaseOnFirstAction(ranks, Seq(v, e0, outW, links) ++ cutter.leftovers: _*)
  }

  /**
   * Personalized PageRank: random walks restart at the `sources` set instead
   * of uniformly, so ranks measure proximity to the sources — the standard
   * seeded-recommendation / related-entities primitive. Teleport vector
   * p(v) = 1/|S| for v ∈ S else 0; ranks initialize to p (total mass 1) and
   * iterate rank' = (1−d)·p + d·(contrib + danglingMass·p), which conserves
   * the unit mass exactly (dangling mass restarts at the sources, like every
   * walk). Fixed iteration count, deterministic — oracle-comparable via the
   * same unrolled-CTE device as [[pageRank]].
   *
   * Same plan shape as [[pageRank]]: links/out-degrees cached once, the
   * dangling-mass term a broadcast singleton folded into the plan (no
   * per-iteration driver action), lineage cut every few rounds.
   *
   * @param sources restart vertices (rows absent from `vertices` are ignored)
   * @return (id, rank DOUBLE), ranks sum to ~1
   */
  def personalizedPageRank(vertices: DataFrame, edges: DataFrame, sources: DataFrame,
                           iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val v = vertices.select(col("id")).distinct().cache()
    val srcs = sources.select(col("id")).distinct()
      .join(v, Seq("id"), "left_semi").cache()
    val nS = srcs.count()
    require(nS > 0, "personalizedPageRank needs at least one source present in `vertices`")
    // persist the edge derivation once (see [[pageRank]]); gate + cache fill
    val e0 = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val m = e0.count()
    val n0 = v.count()
    // Distillate gate (see [[Local]]): same teleport-vector iteration;
    // double-sum order parity as in [[pageRank]].
    if (longCols(e0, "src", "dst") && longCols(v, "id") &&
        m <= localGraphGate(edges) && n0 <= LocalGraphMaxVertices) {
      val eArr = collectPairs(e0)
      val vArr = collectIds(v)
      val sArr = collectIds(srcs)
      e0.unpersist(false); v.unpersist(false); srcs.unpersist(false)
      val spark = vertices.sparkSession
      import spark.implicits._
      return Local.personalizedPageRank(vArr, eArr, sArr, iters, damping)
        .toSeq.toDF("id", "rank")
    }
    val p = v.join(srcs.withColumn("__p", lit(1.0 / nS)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__p"), lit(0.0)).as("p")).cache()
    val outDeg = e0.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).cache()
    val links = e0.select("src", "dst").join(outDeg, col("src") === col("id")).drop("id").cache()
    links.count()
    val cutter = new Cutter
    var ranks = p.select(col("id"), col("p").as("rank"))
    for (i <- 0 until iters) {
      val contribs = links.join(ranks, links("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
      val dangling = ranks.join(outDeg, Seq("id"), "left_semi")
        .agg((lit(1.0) - sum("rank")).as("__dm"))
      val next = p.join(contribs, Seq("id"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(1 - damping) * col("p") +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("__dm") * col("p"))).as("rank"))
      ranks = cutter(next, i)
    }
    releaseOnFirstAction(ranks, Seq(v, srcs, p, e0, outDeg, links) ++ cutter.leftovers: _*)
  }

  /**
   * Closeness centrality over directed edges: C(v) = r(v) / Σ_{u reachable
   * from v} d(v, u), where r(v) is the count of vertices reachable from v
   * (excluding v itself) — the reachable-set normalization that keeps
   * disconnected graphs meaningful (a vertex reaching nothing scores 0
   * rather than dividing by an undefined distance sum). Same per-source BFS
   * machinery and scale posture as [[harmonicCentrality]]: state is
   * O(Σ per-source reachability), the exact opt-in; use the landmark
   * estimators when that sum is unaffordable.
   *
   * @param vertices (id) — vertices to report (no out-edges ⇒ 0.0)
   * @param edges (src, dst)
   * @return (id, closeness DOUBLE)
   */
  def closenessCentrality(vertices: DataFrame, edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val vs = vertices.select(col("id")).distinct()
    val seeds = vs.join(edges.select(col("src").as("id")), Seq("id"), "left_semi")
    val st = bfsPerSource(edges, seeds, maxIter)
      .filter(col("level") > 0)
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("double").as("r"), sum(col("level")).as("sd"))
    vs.join(st, Seq("id"), "left")
      .select(col("id"), coalesce(col("r") / col("sd"), lit(0.0)).as("closeness"))
  }

  /**
   * Directed degree assortativity: the Pearson correlation, across edges,
   * between the source's out-degree and the destination's in-degree —
   * "do high-fanout vertices point at high-fanin vertices?" (Newman 2002's
   * assortativity coefficient, out-in variant). Two degree aggregations +
   * two joins + one corr — a single-pass graph summary statistic.
   *
   * @param edges (src, dst) — multi-edges count toward degrees
   * @return single row (assortativity DOUBLE); NULL when degenerate
   *         (fewer than two distinct degree pairs)
   */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst")
    val out = e.groupBy(col("src").as("__o_id")).agg(count(lit(1)).as("odeg"))
    val in = e.groupBy(col("dst").as("__i_id")).agg(count(lit(1)).as("ideg"))
    // Pearson r assembled from covar/stddev rather than corr(): ANSI mode
    // (Spark 4 default) makes corr() raise DIVIDE_BY_ZERO on a degenerate
    // (zero-variance) side; SQL semantics — and the DuckDB oracle — return
    // NULL there instead.
    e.join(out, col("src") === col("__o_id"))
      .join(in, col("dst") === col("__i_id"))
      .agg(covar_samp(col("odeg").cast("double"), col("ideg").cast("double")).as("__c"),
        stddev_samp(col("odeg").cast("double")).as("__sx"),
        stddev_samp(col("ideg").cast("double")).as("__sy"))
      .select(when(col("__sx") > 0 && col("__sy") > 0,
        col("__c") / (col("__sx") * col("__sy"))).as("assortativity"))
  }

  /**
   * HITS hubs and authorities (Kleinberg 1999) with L1 normalization each
   * half-step: auth_i(d) = Σ_{s→d} hub_{i-1}(s) then scaled to sum 1;
   * hub_i(s) = Σ_{s→d} auth_i(d) then scaled to sum 1. Fixed iteration
   * count, deterministic — oracle-comparable by the same unrolled-CTE
   * device as [[pageRank]].
   *
   * Plan shape: the deduplicated edge list is cached once; each half-step
   * is one shuffle join + partial aggregation, and the normalizer is a
   * broadcast singleton folded into the plan (no per-iteration driver
   * action). L1 (sum) normalization rather than the classical L2 keeps the
   * scale factor a plain aggregate both here and in the SQL oracle.
   *
   * @param edges (src, dst) directed; duplicates collapse
   * @return (id, hub DOUBLE, auth DOUBLE) for every vertex incident to an
   *         edge; hub sums to 1 and auth sums to 1
   */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"hits needs iters >= 1, got $iters")
    val e = edges.select("src", "dst").distinct().cache()
    // Distillate gate (see [[Local]]): same L1-normalized half-steps;
    // double-sum order parity as in [[pageRank]].
    if (longCols(e, "src", "dst") && e.count() <= localGraphGate(edges)) {
      val eArr = collectPairs(e)
      e.unpersist(false)
      val spark = edges.sparkSession
      import spark.implicits._
      return Local.hits(eArr, iters).toSeq.toDF("id", "hub", "auth")
    }
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().cache()
    // score frames are |V|-sized; under the broadcast gate each half-step
    // joins the CACHED edge list against a broadcast of the scores — the
    // edge side never re-shuffles (4 SMJ exchanges of |E| rows saved per
    // 2 iterations). Above the gate, AQE picks the strategy from runtime
    // sizes (the same device as the link predictors' degree tables).
    val small = nodes.count() <= MaxBroadcastVertices
    def hint(scores: DataFrame): DataFrame = if (small) broadcast(scores) else scores
    val cutter = new Cutter
    var hub = nodes.withColumn("hub", lit(1.0))
    var auth: DataFrame = null
    for (i <- 0 until iters) {
      val aRaw = e.join(hint(hub), e("src") === hub("id"))
        .groupBy(e("dst").as("id")).agg(sum("hub").as("a"))
      val aNorm = aRaw.agg(sum("a").as("__as"))
      val a = nodes.join(aRaw, Seq("id"), "left")
        .crossJoin(broadcast(aNorm))
        .select(col("id"), (coalesce(col("a"), lit(0.0)) / col("__as")).as("auth"))
      auth = cutter(a, 2 * i)
      val hRaw = e.join(hint(auth), e("dst") === auth("id"))
        .groupBy(e("src").as("id")).agg(sum("auth").as("h"))
      val hNorm = hRaw.agg(sum("h").as("__hs"))
      val h = nodes.join(hRaw, Seq("id"), "left")
        .crossJoin(broadcast(hNorm))
        .select(col("id"), (coalesce(col("h"), lit(0.0)) / col("__hs")).as("hub"))
      hub = cutter(h, 2 * i + 1)
    }
    val out = hub.join(auth, Seq("id"))
      .select(col("id"), col("hub"), col("auth"))
    releaseOnFirstAction(out, Seq(e, nodes) ++ cutter.leftovers: _*)
  }

  /**
   * Deterministic fixed-length random walks — the corpus generator for
   * graph-embedding training (DeepWalk/node2vec's input stage re-expressed
   * for an external oracle): from each seed, `steps` hops where the next
   * vertex is the out-neighbor minimizing md5("walkId:step:candidate").
   * The hash plays the role of the RNG — uniform over the neighbor set,
   * independent across (walk, step), and byte-reproducible in any engine
   * that agrees on md5 of the decimal-string key (the same device as
   * [[harmonicLandmark]]'s sampling).
   *
   * Each step is one join on the current position + one min_by aggregate —
   * state is O(#walks), never O(graph); walks that reach a sink vertex
   * simply end (the join drops them). Lineage is cut on the Cutter cadence.
   *
   * @param edges (src, dst); duplicates collapse (a duplicate edge must not
   *              bias the pick — the hash is per candidate value)
   * @param seeds (id) walk start vertices; walk_id = seed id
   * @param steps hop count
   * @return (walk_id BIGINT, step INT, node BIGINT) — step 0 is the seed
   */
  def randomWalks(edges: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    require(steps >= 0, s"randomWalks needs steps >= 0, got $steps")
    val e = edges.select("src", "dst").distinct().cache()
    // Distillate gate (see [[Local]]): exact — the md5-argmin next-hop
    // strings are replicated byte for byte over the same deduped edges.
    if (longCols(e, "src", "dst") && longCols(seeds.select(col("id")), "id") &&
        e.count() <= localGraphGate(edges)) {
      val sd = seeds.select(col("id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      if (sd.count() <= LocalGraphMaxVertices) {
        val eArr = collectPairs(e)
        val sArr = collectIds(sd)
        e.unpersist(false); sd.unpersist(false)
        val spark = edges.sparkSession
        import spark.implicits._
        return Local.randomWalks(eArr, sArr, steps).toSeq.toDF("walk_id", "step", "node")
      }
      sd.unpersist(false)
    }
    e.count()
    val cutter = new Cutter
    var cur = seeds.select(col("id")).distinct()
      .select(col("id").as("walk_id"), lit(0).as("step"), col("id").as("node"))
    var walks = cur
    for (s <- 1 to steps) {
      val next = cur.join(e, cur("node") === e("src"))
        .select(col("walk_id"),
          col("dst"),
          md5(concat_ws(":", col("walk_id"), lit(s), col("dst"))).as("h"))
        .groupBy("walk_id")
        .agg(min_by(col("dst"), col("h")).as("node"))
        .withColumn("step", lit(s))
        .select("walk_id", "step", "node")
      cur = cutter(next, s - 1)
      walks = walks.unionByName(cur)
    }
    releaseOnFirstAction(walks, e +: cutter.leftovers: _*)
  }

  /**
   * Strongly connected components by trim + forward-max coloring + backward
   * sweep (the FW-BW/coloring family: Orzan 2004, as used by every
   * distributed SCC system since — Spark has no built-in SCC).
   *
   * Each outer round:
   *  1. TRIM — iteratively peel vertices with no in-edge or no out-edge in
   *     the live subgraph; each is its own singleton SCC. This removes the
   *     whole DAG periphery cheaply (and entirely solves acyclic graphs),
   *     which is what defuses the coloring algorithm's known worst case
   *     (a decreasing-id chain would otherwise peel one root per round).
   *  2. COLOR — propagate color(v) = max id u with a path u →* v to
   *     fixpoint (frontier-based: only improved colors re-propagate).
   *     Every color class has its root r (color(r) = r) live inside it.
   *  3. SWEEP — one multi-source backward BFS from all roots at once,
   *     restricted to same-colored vertices: the reached set of root r is
   *     exactly FW(r) ∩ BW(r) = SCC(r). Assign, remove, repeat on the rest.
   *
   * Rounds are bounded by the condensation's chain structure — typically
   * 1-2 on real graphs (one giant SCC + periphery); pathological inputs
   * hit the shared `maxIter` budget and fail loudly (BudgetExhausted)
   * rather than silently mislabeling. Every inner iteration (trim pass,
   * color propagation, sweep level) counts against the budget.
   *
   * Two scale/latency devices (the first implementation spent 27 s at
   * sf0.1 on ~200 sub-second jobs — pure round-count × job-latency):
   *  - HOP AUGMENTATION: color and sweep propagate over e ∪ e² ∪ e³
   *    (3 hops per round → 3× fewer rounds), computed once per outer
   *    round and only while |e| ≤ [[SccAugMaxEdges]] — augmentation is a
   *    pure accelerator (same fixpoints: max-over-reachability and
   *    backward reachability are closed under multi-hop edges; any
   *    intermediate vertex of a within-SCC path is itself in the SCC, so
   *    unrestricted 2/3-hop shortcuts never admit a wrong member). On a
   *    giant-SCC graph above the gate the quadratic wedge growth of e²
   *    would dominate, so big graphs propagate 1 hop at a time.
   *  - ONE ACTION PER ROUND: only the per-round DELTA (improved colors /
   *    sweep frontier) is eagerly checkpointed; the accumulated state is
   *    a lazy union of those checkpointed leaves, collapsed every 4th
   *    round — vs checkpointing the full state every round.
   *
   * @param vertices (id) — vertices to report (isolated ⇒ singleton SCC)
   * @param edges (src, dst) directed
   * @return (id, scc BIGINT = min member id of the component)
   */
  def stronglyConnectedComponents(vertices: DataFrame, edges: DataFrame,
                                  maxIter: Int = 200): DataFrame = {
    val vsAll = vertices.select(col("id")).distinct().localCheckpoint(true)
    var nodes = vsAll
    var e = edges.select("src", "dst").filter(col("src") =!= col("dst")).distinct()
      .join(nodes.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .localCheckpoint(true)
    // assigned (id, root): root is the coloring root (relabeled to min at the end)
    var assigned = nodes.filter(lit(false)).select(col("id"), col("id").as("root"))
    var assignedPending = 0
    def assign(delta: DataFrame): Unit = {
      assigned = assigned.unionByName(delta)
      assignedPending += 1
      if (assignedPending >= 8) { assigned = assigned.localCheckpoint(true); assignedPending = 0 }
    }
    var budget = maxIter
    var live = nodes.count()
    // ENTRY gate (round 14): the round-13 residual-tail gate only fired
    // after the distributed trim loop had already paid its per-pass job
    // floor; when the INITIAL graph is already distillate-sized (and the
    // vertex set is bounded — trim hasn't yet established live ≤ 2·edges),
    // go straight to the in-JVM Tarjan.
    if (live > 0 && live <= LocalGraphMaxVertices &&
        longCols(e, "src", "dst") && longCols(nodes, "id") &&
        e.count() <= localGraphGate(edges)) {
      val vArr = collectIds(nodes.select(col("id")))
      val eArr = collectPairs(e.select(col("src"), col("dst")))
      val spark = vertices.sparkSession
      import spark.implicits._
      assign(localSccLabels(vArr, eArr).toSeq.toDF("id", "root"))
      nodes = nodes.filter(lit(false)).localCheckpoint(true)
      live = 0L
    }
    // Small-state tail: once the live subgraph is tiny relative to the
    // cluster, per-round task-scheduling latency dominates the actual work
    // (measured 0.37 s/round on a 1868-node graph at 32 shuffle
    // partitions). Collapsing the iteration state to ONE partition makes
    // every join a single-task broadcast under AQE. Big graphs (> 1M live
    // vertices) keep full parallelism.
    def squeeze(df: DataFrame): DataFrame =
      if (live <= 1000000L) df.coalesce(1) else df
    val __dbg = sys.env.contains("GRAFT_SCC_DEBUG")
    var __t = System.nanoTime()
    def __lap(tag: String): Unit = if (__dbg) {
      val now = System.nanoTime()
      System.err.println(f"[scc] $tag%-14s ${(now - __t) / 1e9}%6.2f s  budget=$budget")
      __t = now
    }
    while (live > 0) {
      // ---- 1. trim the DAG periphery, one peel layer per materialization.
      // (Composing several lazy passes per job looks tempting but each pass
      // references keep/e TWICE — the un-reused plan subtree doubles per
      // pass and analysis cost explodes exponentially; measured 6x slower.)
      // Only `keep` materializes every pass (its count decides the
      // fixpoint); the shrinking edge set re-roots every 4th pass.
      var trimming = true
      var trimPass = 0
      while (trimming && live > 0) {
        if (budget <= 0) throw new BudgetExhausted("stronglyConnectedComponents", maxIter)
        budget -= 1
        val hasIn = e.select(col("dst").as("id")).distinct()
        val hasOut = e.select(col("src").as("id")).distinct()
        val keep = squeeze(nodes.join(hasIn, Seq("id"), "left_semi")
          .join(hasOut, Seq("id"), "left_semi")).localCheckpoint(true)
        val kept = keep.count()
        if (kept == live) trimming = false
        else {
          assign(nodes.join(keep, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("root")))
          nodes = keep
          live = kept
          trimPass += 1
          e = squeeze(e.join(nodes.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi"))
            .localCheckpoint(true)
        }
      }
      __lap("trim")
      if (live > 0) {
        // re-root the (possibly lazily filtered) edge set once for the
        // color/sweep loops, then build this round's hop augmentation
        e = squeeze(e).localCheckpoint(true)
        val eCount = e.count()
        // Residual-tail gate: the color/sweep machinery pays 2-4 jobs per
        // LEVEL; once the live subgraph is distillate-sized (post-trim
        // residuals usually are), collect it and finish with in-JVM Tarjan —
        // identical min-id components (the epilogue relabels to min either
        // way), zero further rounds. Big residuals keep the distributed
        // loop; the gate re-checks every outer round as `live` shrinks.
        // (post-trim every live vertex has in- and out-degree ≥ 1, so
        // live ≤ 2·eCount — the edge gate bounds the collect)
        if (eCount <= localGraphGate(edges)) {
          val vArr = nodes.select(col("id")).collect().map(_.getLong(0))
          val eArr = e.select(col("src"), col("dst")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          val spark = vertices.sparkSession
          import spark.implicits._
          assign(localSccLabels(vArr, eArr).toSeq.toDF("id", "root"))
          nodes = nodes.filter(lit(false)).localCheckpoint(true)
          live = 0L
        } else {
        val eAug =
          if (eCount > SccAugMaxEdges) e
          else {
            val ab = e.select(col("src").as("a"), col("dst").as("b"))
            val bc = e.select(col("src").as("b"), col("dst").as("c"))
            val e2 = ab.join(bc, "b").select(col("a").as("src"), col("c").as("dst"))
              .filter(col("src") =!= col("dst")).distinct()
            val cd = e.select(col("src").as("c"), col("dst").as("d"))
            val e3 = e2.select(col("src").as("a"), col("dst").as("c")).join(cd, "c")
              .select(col("a").as("src"), col("d").as("dst"))
              .filter(col("src") =!= col("dst")).distinct()
            squeeze(e.unionByName(e2).unionByName(e3).distinct()).localCheckpoint(true)
          }
        __lap("augment")
        // ---- 2. forward-max coloring to fixpoint (frontier-based over eAug)
        var color = squeeze(nodes.select(col("id"), col("id").as("color"))).localCheckpoint(true)
        var colorPending = 0
        var frontier = color
        var coloring = true
        while (coloring) {
          if (budget <= 0) throw new BudgetExhausted("stronglyConnectedComponents", maxIter)
          budget -= 1
          val prop = frontier.join(eAug, frontier("id") === eAug("src"))
            .groupBy(eAug("dst").as("id")).agg(max("color").as("nc"))
          val improved = squeeze(prop.join(color, Seq("id"))
            .filter(col("nc") > col("color"))
            .select(col("id"), col("nc").as("color")))
            .localCheckpoint(true)
          if (improved.count() == 0L) coloring = false
          else {
            color = color.join(improved.select("id"), Seq("id"), "left_anti")
              .unionByName(improved)
            colorPending += 1
            if (colorPending >= 4) { color = squeeze(color).localCheckpoint(true); colorPending = 0 }
            frontier = improved
          }
        }
        __lap("color")
        // ---- 3. backward sweep from the roots, within each color class
        val roots = color.filter(col("color") === col("id")).select(col("id").as("root"))
        var reached = squeeze(roots.select(col("root"), col("root").as("id"))).localCheckpoint(true)
        var reachedPending = 0
        var bf = reached
        var sweeping = true
        while (sweeping) {
          if (budget <= 0) throw new BudgetExhausted("stronglyConnectedComponents", maxIter)
          budget -= 1
          val cand = squeeze(bf.join(eAug, bf("id") === eAug("dst"))
            .select(col("root"), eAug("src").as("id")).distinct()
            .join(color, Seq("id"))
            .filter(col("color") === col("root")).drop("color")
            .join(reached, Seq("root", "id"), "left_anti"))
            .localCheckpoint(true)
          if (cand.count() == 0L) sweeping = false
          else {
            reached = reached.unionByName(cand)
            reachedPending += 1
            if (reachedPending >= 4) { reached = squeeze(reached).localCheckpoint(true); reachedPending = 0 }
            bf = cand
          }
        }
        __lap("sweep")
        val found = reached.select(col("id"), col("root")).localCheckpoint(true)
        val c = found.count()
        assign(found)
        nodes = nodes.join(found.select("id"), Seq("id"), "left_anti").localCheckpoint(true)
        live -= c
        e = e.join(nodes.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint(true)
        } // end distributed color/sweep (residual-tail gate's else)
      }
    }
    __lap("epilogue")
    // relabel each component to its minimum member id (stable, orderable)
    val minId = assigned.groupBy("root").agg(min("id").as("scc"))
    vsAll.join(assigned.join(minId, "root").select(col("id"), col("scc")), Seq("id"), "left")
      .select(col("id"), coalesce(col("scc"), col("id")).as("scc"))
  }

  /**
   * Newman modularity Q of a vertex partition over an undirected simple
   * graph: Q = W/m − S/(4m²) with m = |edges|, W = within-community edges,
   * S = Σ_c (Σ_{i∈c} deg i)². The partition-quality score behind community
   * detection ([[labelPropagation]] supplies the partition here).
   *
   * All three aggregates are INTEGER sums (exact, partition-order-free);
   * the one double expression evaluates over three scalars — deterministic
   * to the bit on any engine, which is what makes Q oracle-checkable. Scale
   * shape: two broadcast-friendly label joins on the edge list + combinable
   * groupBys; the three one-row aggregates broadcast into the final
   * expression, nothing collects.
   *
   * @param labels (id, community)
   * @param edges  directed edge rows; deduped to canonical a < b undirected
   *               form, self-loops dropped
   * @return one row (m, within_edges, q) — q rounded to 6
   */
  def modularity(labels: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val la = labels.select(col("id").as("a"), col("community").as("__ca"))
    val lb = labels.select(col("id").as("b"), col("community").as("__cb"))
    val tagged = und.join(la, Seq("a")).join(lb, Seq("b"))
    val m = und.agg(count(lit(1)).as("m"))
    val w = tagged.filter(col("__ca") === col("__cb"))
      .agg(count(lit(1)).as("within_edges"))
    val deg = und.select(col("a").as("id")).unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__k"))
    val s = labels.join(deg, Seq("id"))
      .groupBy("community").agg(sum("__k").as("__vol"))
      .agg(sum(col("__vol") * col("__vol")).as("__s"))
    m.crossJoin(broadcast(w)).crossJoin(broadcast(s))
      .select(col("m"), col("within_edges"),
        round(col("within_edges").cast("double") / col("m")
          - col("__s").cast("double") / (lit(4.0) * col("m") * col("m")), 6).as("q"))
  }

  /**
   * Per-community conductance φ(c) = cut(c) / min(vol(c), 2m − vol(c)) over
   * an undirected simple graph — the community-level quality breakdown
   * [[modularity]] aggregates away (a community can hide inside a good
   * global Q). cut = edges with exactly one endpoint in c, vol = Σ degree.
   * Integer aggregates; one double expression per output row; the
   * whole-graph community (vol = 2m) reads NULL (no outside to cut to).
   *
   * Scale shape mirrors modularity: two label joins on the edge list,
   * combinable groupBys, a broadcast m singleton.
   *
   * @return (community, vol, cut, phi) — phi rounded to 6
   */
  /**
   * Incremental connected components: fold NEW edges into an existing
   * labeling without re-walking the old edge set — the graph sibling of
   * [[graft.events.EventOps.aggApply]]. New edges contract through the old
   * labels (endpoint → its component, absent endpoints stay themselves),
   * WCC runs over the CONTRACTED graph (old components + delta edges —
   * delta-sized work, the full edge history never re-joins), and the old
   * labeling composes through the result. Exact invariant (spec-pinned
   * and oracle-checked as `wcc_apply`):
   * `ccApply(cc(E₁), E₂) == cc(E₁ ∪ E₂)` — because labels are component
   * MINIMUM ids, and the min over a merged component equals the min over
   * its constituent old components' labels.
   *
   * @param oldComp (id, component) from [[connectedComponents]]
   * @return (id, component) over old ids ∪ new-edge endpoints
   */
  def connectedComponentsApply(oldComp: DataFrame, newEdges: DataFrame): DataFrame = {
    val m = oldComp.select(col("id"), col("component"))
    val contracted = newEdges.select(col("src"), col("dst"))
      .join(m.select(col("id").as("src"), col("component").as("__cs")), Seq("src"), "left")
      .join(m.select(col("id").as("dst"), col("component").as("__cd")), Seq("dst"), "left")
      .select(coalesce(col("__cs"), col("src")).as("src"),
        coalesce(col("__cd"), col("dst")).as("dst"))
    val members = m.select(col("component").as("id"))
      .unionByName(contracted.select(col("src").as("id")))
      .unionByName(contracted.select(col("dst").as("id"))).distinct()
    val comp2 = connectedComponents(members, contracted)
    val newIds = newEdges.select(col("src").as("id"))
      .unionByName(newEdges.select(col("dst").as("id"))).distinct()
      .join(m, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    m.unionByName(newIds)
      .join(comp2.select(col("id").as("component"), col("component").as("__c2")),
        Seq("component"))
      .select(col("id"), col("__c2").as("component"))
  }

  /**
   * Directed-graph reciprocity: the fraction of (deduplicated, non-loop)
   * edges whose reverse edge also exists — the one-number answer to "is
   * this graph mutual or hierarchical" (follows vs citations). One
   * distinct + one self-semi-join on the reversed keys; scalar output.
   *
   * @return one row (edges BIGINT, reciprocal BIGINT, reciprocity rounded 6)
   */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rec = e.join(e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    val out = e.agg(count(lit(1)).as("edges"))
      .crossJoin(rec.agg(count(lit(1)).as("reciprocal")))
      .select(col("edges"), col("reciprocal"),
        round(col("reciprocal").cast("double") / col("edges"), 6).as("reciprocity"))
    graft.util.CacheLifecycle.releaseOnFirstAction(out, e)
  }

  def conductance(labels: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val la = labels.select(col("id").as("a"), col("community").as("__ca"))
    val lb = labels.select(col("id").as("b"), col("community").as("__cb"))
    val tagged = und.join(la, Seq("a")).join(lb, Seq("b"))
    val cut = tagged.filter(col("__ca") =!= col("__cb"))
      .select(explode(array(col("__ca"), col("__cb"))).as("community"))
      .groupBy("community").agg(count(lit(1)).as("cut"))
    val deg = und.select(col("a").as("id")).unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__k"))
    val vol = labels.join(deg, Seq("id"))
      .groupBy("community").agg(sum("__k").as("vol"))
    val m = und.agg(count(lit(1)).as("__m"))
    val denom = least(col("vol"), lit(2) * col("__m") - col("vol"))
    vol.join(cut, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"),
        round(when(denom > 0,
          coalesce(col("cut"), lit(0L)).cast("double") / denom), 6).as("phi"))
  }
}
