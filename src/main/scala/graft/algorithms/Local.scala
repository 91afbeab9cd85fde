package graft.algorithms

import scala.collection.mutable

/**
 * Driver-local loop bodies for distillate-sized graphs — the in-JVM twins
 * of the distributed iterative algorithms in [[Algorithms]].
 *
 * WHY (measured, round 13/14): on a graph of a few thousand vertices the
 * distributed loops are pure per-round JOB FLOOR — pagerank at sf0.1 is 92
 * Spark jobs / 32 task-seconds for a 30-vertex graph, ppr 113 jobs, mis 53
 * jobs — tens of scheduling round-trips for sub-second real work. The CC
 * union-find / SCC Tarjan gates (round 13) established the device: the
 * corpus-scale derivation stays distributed, and when the DERIVED graph is
 * distillate-sized (≤ [[Algorithms.LocalGraphMaxEdges]], ≈32 MB of long
 * pairs) the fixpoint runs in one collect + one in-JVM loop + one
 * parallelize, instead of 2-10 jobs per round. Above the gate the
 * distributed loops run unchanged — a 100 TB graph never collects.
 *
 * EQUIVALENCE CONTRACT (what makes the gate safe, per algorithm):
 *  - integer/lexicographic fixpoints (BFS levels, σ counts, k-core,
 *    k-truss, LPA argmax, MIS md5 priorities, md5-argmin walks) are
 *    replicated round-for-round and are bit-exact by construction;
 *  - min-plus (SSSP) relaxes the same (dist + w) candidates round by
 *    round — every kept double is produced by the identical two-operand
 *    expression, so it is bit-exact too;
 *  - double-sum loops (PageRank family, HITS, betweenness δ) differ only
 *    in partial-sum ORDER (Spark's partial aggregation order is itself
 *    partition-dependent and the DuckDB oracle sums in yet another order);
 *    every published query rounds these to 6 decimals, and local-vs-
 *    distributed parity is spec-pinned plus oracle-verified at all SFs.
 *
 * Budget semantics are preserved: the local loops are LEVEL-SYNCHRONOUS
 * replicas of the distributed rounds and throw the same
 * [[Algorithms.BudgetExhausted]] at the same round counts.
 */
private[graft] object Local {

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Dense vertex index + CSR out-adjacency (multiplicity preserved —
    * σ counting must see parallel edges exactly as the distributed join
    * does). Vertices = every id in `extraIds` plus every edge endpoint. */
  final class Csr(edges: Array[(Long, Long)], extraIds: Array[Long]) {
    val idx = new mutable.LongMap[Int]()
    val ids = new mutable.ArrayBuffer[Long]()
    private def at(v: Long): Int =
      idx.getOrElseUpdate(v, { ids += v; ids.length - 1 })
    extraIds.foreach(at)
    edges.foreach { case (s, d) => at(s); at(d) }
    val n: Int = ids.length
    val deg = new Array[Int](n)
    edges.foreach { case (s, _) => deg(idx(s)) += 1 }
    val off: Array[Int] = {
      val o = new Array[Int](n + 1)
      var i = 0
      while (i < n) { o(i + 1) = o(i) + deg(i); i += 1 }
      o
    }
    val adj: Array[Int] = {
      val a = new Array[Int](off(n))
      val fill = off.clone()
      edges.foreach { case (s, d) =>
        val si = idx(s); a(fill(si)) = idx(d); fill(si) += 1 }
      a
    }
    def outFrom(v: Int): Range = off(v) until off(v + 1)
  }

  /** Multi-source BFS levels — [[Algorithms.bfs]]'s fixpoint. */
  def bfsLevels(edges: Array[(Long, Long)], sources: Array[Long],
                maxIter: Int): Array[(Long, Int)] = {
    val g = new Csr(edges, sources)
    val level = Array.fill(g.n)(-1)
    var frontier = sources.distinct.map(g.idx(_))
    frontier.foreach(level(_) = 0)
    var iter = 0
    while (frontier.nonEmpty && iter < maxIter) {
      val next = new mutable.ArrayBuffer[Int]()
      frontier.foreach { v =>
        g.outFrom(v).foreach { ei =>
          val w = g.adj(ei)
          if (level(w) < 0) { level(w) = iter + 1; next += w }
        }
      }
      frontier = next.toArray
      iter += 1
    }
    if (frontier.nonEmpty) throw new Algorithms.BudgetExhausted("bfs", maxIter)
    (0 until g.n).iterator.filter(level(_) >= 0)
      .map(i => (g.ids(i), level(i))).toArray
  }

  /** Per-source BFS levels — [[Algorithms.bfsPerSource]]. Returns None when
    * the accumulated (src, id, level) state would exceed `maxRows` (caller
    * falls back to the distributed loop, whose state is disk-backed). */
  def bfsPerSource(edges: Array[(Long, Long)], sources: Array[Long],
                   maxIter: Int, maxRows: Long): Option[Array[(Long, Long, Int)]] = {
    val g = new Csr(edges, sources)
    val out = new mutable.ArrayBuffer[(Long, Long, Int)]()
    val level = new Array[Int](g.n)
    val distinctSrc = sources.distinct
    for (s <- distinctSrc) {
      java.util.Arrays.fill(level, -1)
      val si = g.idx(s)
      level(si) = 0
      out += ((s, s, 0))
      var frontier = Array(si)
      var iter = 0
      while (frontier.nonEmpty && iter < maxIter) {
        val next = new mutable.ArrayBuffer[Int]()
        frontier.foreach { v =>
          g.outFrom(v).foreach { ei =>
            val w = g.adj(ei)
            if (level(w) < 0) { level(w) = iter + 1; next += w; out += ((s, g.ids(w), iter + 1)) }
          }
        }
        frontier = next.toArray
        iter += 1
        // cap checked per ROUND, not per completed source: one over-budget
        // source aborts mid-flood instead of first materializing its whole
        // reachability on the driver (r14 advisory)
        if (out.length > maxRows) return None
      }
      if (frontier.nonEmpty) throw new Algorithms.BudgetExhausted("bfsPerSource", maxIter)
    }
    Some(out.toArray)
  }

  /** Per-source BFS carrying shortest-path counts —
    * [[Algorithms.shortestPathCounts]]. σ is an exact long sum over the
    * level-(L−1) DAG parents; parallel edges multi-count, exactly as the
    * distributed frontier join does. */
  def sigmaCounts(edges: Array[(Long, Long)], sources: Array[Long],
                  maxIter: Int, maxRows: Long): Option[Array[(Long, Long, Int, Long)]] = {
    val g = new Csr(edges, sources)
    val out = new mutable.ArrayBuffer[(Long, Long, Int, Long)]()
    val level = new Array[Int](g.n)
    val sigma = new Array[Long](g.n)
    for (s <- sources.distinct) {
      java.util.Arrays.fill(level, -1)
      val si = g.idx(s)
      level(si) = 0; sigma(si) = 1L
      out += ((s, s, 0, 1L))
      var frontier = Array(si)
      var iter = 0
      while (frontier.nonEmpty && iter < maxIter) {
        // candidate σ sums for this level, over edges out of the frontier
        val cand = new mutable.LongMap[Long]()
        frontier.foreach { v =>
          g.outFrom(v).foreach { ei =>
            val w = g.adj(ei)
            if (level(w) < 0) {
              val k = w.toLong
              cand.update(k, cand.getOrElse(k, 0L) + sigma(v))
            }
          }
        }
        val next = new mutable.ArrayBuffer[Int]()
        cand.foreach { case (wi, sg) =>
          val w = wi.toInt
          level(w) = iter + 1; sigma(w) = sg; next += w
          out += ((s, g.ids(w), iter + 1, sg))
        }
        frontier = next.toArray
        iter += 1
        // per-ROUND cap check — see [[bfsPerSource]]
        if (out.length > maxRows) return None
      }
      if (frontier.nonEmpty) throw new Algorithms.BudgetExhausted("shortestPathCounts", maxIter)
    }
    Some(out.toArray)
  }

  /** Frontier Bellman–Ford — [[Algorithms.sssp]]. Round-synchronous: each
    * round relaxes only edges out of last round's improved set; every kept
    * distance is produced by the identical `dist + w` expression, so values
    * are bit-equal to the distributed loop's. */
  def sssp(edges: Array[(Long, Long, Double)], sources: Array[Long],
           maxIter: Int): Array[(Long, Double)] = {
    val idx = new mutable.LongMap[Int]()
    val ids = new mutable.ArrayBuffer[Long]()
    def at(v: Long): Int = idx.getOrElseUpdate(v, { ids += v; ids.length - 1 })
    sources.foreach(at)
    edges.foreach { case (s, d, _) => at(s); at(d) }
    val n = ids.length
    val deg = new Array[Int](n)
    edges.foreach { case (s, _, _) => deg(idx(s)) += 1 }
    val off = new Array[Int](n + 1)
    var oi = 0
    while (oi < n) { off(oi + 1) = off(oi) + deg(oi); oi += 1 }
    val adjV = new Array[Int](off(n))
    val adjW = new Array[Double](off(n))
    val fill = off.clone()
    edges.foreach { case (s, d, w) =>
      val si = idx(s); adjV(fill(si)) = idx(d); adjW(fill(si)) = w; fill(si) += 1 }
    val dist = new Array[Double](n)
    val has = new Array[Boolean](n)
    var frontier = sources.distinct.map(idx(_))
    frontier.foreach { v => dist(v) = 0.0; has(v) = true }
    var iter = 0
    while (frontier.nonEmpty && iter < maxIter) {
      // min candidate per destination this round, then improve
      val cand = new mutable.LongMap[Double]()
      frontier.foreach { v =>
        var ei = off(v)
        while (ei < off(v + 1)) {
          val w = adjV(ei)
          val nd = dist(v) + adjW(ei)
          val k = w.toLong
          if (!cand.contains(k) || nd < cand(k)) cand.update(k, nd)
          ei += 1
        }
      }
      val improved = new mutable.ArrayBuffer[Int]()
      cand.foreach { case (wi, nd) =>
        val w = wi.toInt
        if (!has(w) || nd < dist(w)) { dist(w) = nd; has(w) = true; improved += w }
      }
      frontier = improved.toArray
      iter += 1
    }
    if (frontier.nonEmpty) throw new Algorithms.BudgetExhausted("sssp", maxIter)
    (0 until n).iterator.filter(has(_)).map(i => (ids(i), dist(i))).toArray
  }

  /** PageRank — [[Algorithms.pageRank]]'s exact iteration: contribs summed
    * per destination, dangling mass = n − Σ rank over out-degreed vertices,
    * rank' = (1−d) + d·(contrib + dm/n). Vertices = `vs` only (edge
    * endpoints outside `vs` receive/contribute exactly as the distributed
    * joins decide: sources outside vs contribute nothing, dsts outside vs
    * are dropped). */
  def pageRank(vs: Array[Long], edges: Array[(Long, Long)],
               iters: Int, damping: Double): Array[(Long, Double)] = {
    val idx = new mutable.LongMap[Int]()
    vs.foreach { v => if (!idx.contains(v)) idx.update(v, idx.size) }
    val n = idx.size
    val nD = n.toDouble
    // links restricted to src ∈ vs (rank join is inner); dst outside vs drops
    val outDeg = new mutable.LongMap[Long]()
    edges.foreach { case (s, _) => outDeg.update(s, outDeg.getOrElse(s, 0L) + 1L) }
    val live = edges.filter { case (s, d) => idx.contains(s) }
    var rank = Array.fill(n)(1.0)
    val hasOut = new Array[Boolean](n)
    idx.foreach { case (v, i) => hasOut(i) = outDeg.contains(v) }
    var it = 0
    while (it < iters) {
      val contrib = new Array[Double](n)
      val seen = new Array[Boolean](n)
      live.foreach { case (s, d) =>
        idx.get(d).foreach { di =>
          contrib(di) += rank(idx(s)) / outDeg(s).toDouble
          seen(di) = true
        }
      }
      var dm = nD
      var i = 0
      while (i < n) { if (hasOut(i)) dm -= rank(i); i += 1 }
      val next = new Array[Double](n)
      i = 0
      while (i < n) {
        val c = if (seen(i)) contrib(i) else 0.0
        next(i) = (1 - damping) + damping * (c + dm / nD)
        i += 1
      }
      rank = next
      it += 1
    }
    val out = new Array[(Long, Double)](n)
    idx.foreach { case (v, i) => out(i) = (v, rank(i)) }
    out
  }

  /** Weighted PageRank — [[Algorithms.pageRankWeighted]]: flow ∝ w/Σw;
    * sources with non-positive total out-weight are dangling. */
  def pageRankWeighted(vs: Array[Long], edges: Array[(Long, Long, Double)],
                       iters: Int, damping: Double): Array[(Long, Double)] = {
    val idx = new mutable.LongMap[Int]()
    vs.foreach { v => if (!idx.contains(v)) idx.update(v, idx.size) }
    val n = idx.size
    val nD = n.toDouble
    val wsumAll = new mutable.LongMap[Double]()
    edges.foreach { case (s, _, w) => wsumAll.update(s, wsumAll.getOrElse(s, 0.0) + w) }
    val wsum = new mutable.LongMap[Double]()
    wsumAll.foreach { case (s, w) => if (w > 0) wsum.update(s, w) }
    val live = edges.filter { case (s, _, _) => wsum.contains(s) && idx.contains(s) }
    var rank = Array.fill(n)(1.0)
    val hasOut = new Array[Boolean](n)
    idx.foreach { case (v, i) => hasOut(i) = wsum.contains(v) }
    var it = 0
    while (it < iters) {
      val contrib = new Array[Double](n)
      val seen = new Array[Boolean](n)
      live.foreach { case (s, d, w) =>
        idx.get(d).foreach { di =>
          contrib(di) += rank(idx(s)) * w / wsum(s)
          seen(di) = true
        }
      }
      var dm = nD
      var i = 0
      while (i < n) { if (hasOut(i)) dm -= rank(i); i += 1 }
      val next = new Array[Double](n)
      i = 0
      while (i < n) {
        val c = if (seen(i)) contrib(i) else 0.0
        next(i) = (1 - damping) + damping * (c + dm / nD)
        i += 1
      }
      rank = next
      it += 1
    }
    val out = new Array[(Long, Double)](n)
    idx.foreach { case (v, i) => out(i) = (v, rank(i)) }
    out
  }

  /** Personalized PageRank — [[Algorithms.personalizedPageRank]]:
    * teleport vector p = 1/|S| on sources∩vs; rank' = (1−d)·p +
    * d·(contrib + dm·p) with dm = 1 − Σ rank over out-degreed vertices. */
  def personalizedPageRank(vs: Array[Long], edges: Array[(Long, Long)],
                           sources: Array[Long], iters: Int,
                           damping: Double): Array[(Long, Double)] = {
    val idx = new mutable.LongMap[Int]()
    vs.foreach { v => if (!idx.contains(v)) idx.update(v, idx.size) }
    val n = idx.size
    val srcs = sources.distinct.filter(idx.contains)
    require(srcs.nonEmpty,
      "personalizedPageRank needs at least one source present in `vertices`")
    val p = new Array[Double](n)
    srcs.foreach(s => p(idx(s)) = 1.0 / srcs.length)
    val outDeg = new mutable.LongMap[Long]()
    edges.foreach { case (s, _) => outDeg.update(s, outDeg.getOrElse(s, 0L) + 1L) }
    val live = edges.filter { case (s, _) => idx.contains(s) }
    val hasOut = new Array[Boolean](n)
    idx.foreach { case (v, i) => hasOut(i) = outDeg.contains(v) }
    var rank = p.clone()
    var it = 0
    while (it < iters) {
      val contrib = new Array[Double](n)
      val seen = new Array[Boolean](n)
      live.foreach { case (s, d) =>
        idx.get(d).foreach { di =>
          contrib(di) += rank(idx(s)) / outDeg(s).toDouble
          seen(di) = true
        }
      }
      var dm = 1.0
      var i = 0
      while (i < n) { if (hasOut(i)) dm -= rank(i); i += 1 }
      val next = new Array[Double](n)
      i = 0
      while (i < n) {
        val c = if (seen(i)) contrib(i) else 0.0
        next(i) = (1 - damping) * p(i) + damping * (c + dm * p(i))
        i += 1
      }
      rank = next
      it += 1
    }
    val out = new Array[(Long, Double)](n)
    idx.foreach { case (v, i) => out(i) = (v, rank(i)) }
    out
  }

  /** HITS — [[Algorithms.hits]]: L1-normalized half-steps over the DEDUPED
    * edge set; vertices = edge endpoints. */
  def hits(edges: Array[(Long, Long)], iters: Int): Array[(Long, Double, Double)] = {
    val e = edges.distinct
    val idx = new mutable.LongMap[Int]()
    val ids = new mutable.ArrayBuffer[Long]()
    def at(v: Long): Int = idx.getOrElseUpdate(v, { ids += v; ids.length - 1 })
    e.foreach { case (s, d) => at(s); at(d) }
    val n = ids.length
    var hub = Array.fill(n)(1.0)
    var auth = new Array[Double](n)
    var it = 0
    while (it < iters) {
      val aRaw = new Array[Double](n)
      e.foreach { case (s, d) => aRaw(idx(d)) += hub(idx(s)) }
      var as = 0.0
      var i = 0
      while (i < n) { as += aRaw(i); i += 1 }
      auth = aRaw.map(_ / as)
      val hRaw = new Array[Double](n)
      e.foreach { case (s, d) => hRaw(idx(s)) += auth(idx(d)) }
      var hs = 0.0
      i = 0
      while (i < n) { hs += hRaw(i); i += 1 }
      hub = hRaw.map(_ / hs)
      it += 1
    }
    (0 until n).map(i => (ids(i), hub(i), auth(i))).toArray
  }

  /** Synchronous LPA — [[Algorithms.labelPropagation]]: per round each
    * vertex adopts the most frequent label among its LABELED neighbors
    * (only `vs` members carry labels — the distributed neighbor-label join
    * is inner), ties to the SMALLEST label; no labeled neighbors keeps the
    * label. Exact integer argmax. */
  def lpa(vs: Array[Long], edges: Array[(Long, Long)], iters: Int): Array[(Long, Long)] = {
    val vIds = vs.distinct
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.distinct
    val g = new Csr(sym, vIds)
    val inVs = new Array[Boolean](g.n)
    vIds.foreach(v => inVs(g.idx(v)) = true)
    var lab = Array.tabulate(g.n)(i => g.ids(i))
    var it = 0
    while (it < iters) {
      val next = lab.clone()
      var v = 0
      while (v < g.n) {
        if (inVs(v)) {
          val cnt = new mutable.LongMap[Long]()
          g.outFrom(v).foreach { ei =>
            val w = g.adj(ei)
            if (inVs(w)) { // unlabeled neighbors are invisible to the vote
              val l = lab(w)
              cnt.update(l, cnt.getOrElse(l, 0L) + 1L)
            }
          }
          if (cnt.nonEmpty) {
            var bestL = 0L; var bestC = -1L
            cnt.foreach { case (l, c) =>
              if (c > bestC || (c == bestC && l < bestL)) { bestL = l; bestC = c }
            }
            next(v) = bestL
          }
        }
        v += 1
      }
      lab = next
      it += 1
    }
    vIds.map(v => (v, lab(g.idx(v))))
  }

  /** Synchronous k-core peel — [[Algorithms.kCore]] round for round
    * (budget semantics preserved): drop all vertices under degree k each
    * round until the edge count is stable. Input must already be canonical
    * (a < b, deduped). Returns surviving incident vertex ids. */
  def kCore(canon: Array[(Long, Long)], k: Int, maxIter: Int): Array[Long] = {
    var e = canon
    var iter = 0
    var converged = e.isEmpty
    while (iter < maxIter && !converged) {
      val deg = new mutable.LongMap[Long]()
      e.foreach { case (a, b) =>
        deg.update(a, deg.getOrElse(a, 0L) + 1L)
        deg.update(b, deg.getOrElse(b, 0L) + 1L)
      }
      val pruned = e.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
      converged = pruned.length == e.length
      e = pruned
      iter += 1
    }
    if (!converged) throw new Algorithms.BudgetExhausted("kCore", maxIter)
    e.flatMap { case (a, b) => Seq(a, b) }.distinct
  }

  /** Synchronous k-truss peel — [[Algorithms.kTruss]] round for round:
    * per-edge triangle support via neighbor-set intersection, edges under
    * k−2 drop, until stable. Input canonical (a < b, deduped). */
  def kTruss(canon: Array[(Long, Long)], k: Int, maxIter: Int): Array[(Long, Long)] = {
    var e = canon
    var iter = 0
    var converged = e.isEmpty
    while (iter < maxIter && !converged) {
      val nbr = new mutable.LongMap[mutable.LongMap[Boolean]]()
      def add(v: Long, w: Long): Unit =
        nbr.getOrElseUpdate(v, new mutable.LongMap[Boolean]()).update(w, true)
      e.foreach { case (a, b) => add(a, b); add(b, a) }
      val pruned =
        if (k == 2) e
        else e.filter { case (a, b) =>
          val na = nbr(a); val nb = nbr(b)
          val (small, big) = if (na.size <= nb.size) (na, nb) else (nb, na)
          var sup = 0L
          small.foreachKey { w => if (big.contains(w)) sup += 1 }
          sup >= k - 2
        }
      converged = pruned.length == e.length
      e = pruned
      iter += 1
    }
    if (!converged) throw new Algorithms.BudgetExhausted("kTruss", maxIter)
    e
  }

  /** Luby MIS with per-round md5 priorities —
    * [[Algorithms.maximalIndependentSet]] round for round: key(v) =
    * md5("round:v") ++ %020d(v); strict-min winners over ACTIVE neighbors,
    * winners' neighbors deactivate. Exact string comparison. */
  def mis(vs: Array[Long], edges: Array[(Long, Long)], maxIter: Int): Array[(Long, Boolean)] = {
    val vIds = vs.distinct
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.distinct
    val adj = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
    sym.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, new mutable.ArrayBuffer[Long]()) += d }
    val inMis = new mutable.LongMap[Boolean]()
    var active: Array[Long] = vIds
    var round = 0
    var budget = maxIter
    while (active.nonEmpty) {
      if (budget <= 0) throw new Algorithms.BudgetExhausted("maximalIndependentSet", maxIter)
      budget -= 1; round += 1
      val activeSet = new mutable.LongMap[Boolean]()
      active.foreach(v => activeSet.update(v, true))
      val key = new mutable.LongMap[String]()
      active.foreach(v => key.update(v, md5Hex(s"$round:$v") + "%020d".format(v)))
      val winners = active.filter { v =>
        var minNk: String = null
        adj.get(v).foreach(_.foreach { w =>
          if (activeSet.contains(w)) {
            val nk = key(w)
            if (minNk == null || nk < minNk) minNk = nk
          }
        })
        minNk == null || key(v) < minNk
      }
      val dead = new mutable.LongMap[Boolean]()
      winners.foreach { v =>
        inMis.update(v, true); dead.update(v, true)
        adj.get(v).foreach(_.foreach(w => dead.update(w, true)))
      }
      active = active.filterNot(dead.contains)
    }
    vIds.map(v => (v, inMis.contains(v)))
  }

  /** Deterministic md5-argmin walks — [[Algorithms.randomWalks]]: next hop
    * minimizes md5("walkId:step:candidate") over the DEDUPED out-neighbor
    * set; sink vertices end the walk. */
  def randomWalks(edges: Array[(Long, Long)], seeds: Array[Long],
                  steps: Int): Array[(Long, Int, Long)] = {
    val e = edges.distinct
    val adj = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
    e.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, new mutable.ArrayBuffer[Long]()) += d }
    val out = new mutable.ArrayBuffer[(Long, Int, Long)]()
    for (seed <- seeds.distinct) {
      out += ((seed, 0, seed))
      var cur = seed
      var s = 1
      var alive = true
      while (s <= steps && alive) {
        adj.get(cur) match {
          case Some(nbrs) if nbrs.nonEmpty =>
            var bestH: String = null; var best = 0L
            nbrs.foreach { d =>
              val h = md5Hex(s"$seed:$s:$d")
              if (bestH == null || h < bestH || (h == bestH && d < best)) {
                bestH = h; best = d
              }
            }
            out += ((seed, s, best))
            cur = best
          case _ => alive = false
        }
        s += 1
      }
    }
    out.toArray
  }

  /** Brandes–Pich landmark betweenness — [[Algorithms.betweennessLandmark]]
    * after landmark selection: forward σ-BFS from each landmark (exact
    * longs), then the backward dependency sweep
    * δ(p) = σ(p) · Σ_w (1 + δ(w)) / σ(w) over the level-(L−1) DAG parents.
    * Returns Σ δ per vertex (caller scales by n/k and left-joins `vs`). */
  def betweennessDeltas(edges: Array[(Long, Long)], landmarks: Array[Long],
                        maxIter: Int): mutable.LongMap[Double] = {
    val g = new Csr(edges, landmarks)
    // reverse adjacency for the backward sweep (multiplicity preserved —
    // the distributed contrib join fans out per parallel edge)
    val rdeg = new Array[Int](g.n)
    var ei = 0
    while (ei < g.adj.length) { rdeg(g.adj(ei)) += 1; ei += 1 }
    val roff = new Array[Int](g.n + 1)
    var ri = 0
    while (ri < g.n) { roff(ri + 1) = roff(ri) + rdeg(ri); ri += 1 }
    val radj = new Array[Int](roff(g.n))
    val rfill = roff.clone()
    var rv = 0
    while (rv < g.n) {
      g.outFrom(rv).foreach { e => val w = g.adj(e); radj(rfill(w)) = rv; rfill(w) += 1 }
      rv += 1
    }
    val dsum = new mutable.LongMap[Double]()
    val level = new Array[Int](g.n)
    val sigma = new Array[Long](g.n)
    for (s <- landmarks.distinct) {
      java.util.Arrays.fill(level, -1)
      val si = g.idx(s)
      level(si) = 0; sigma(si) = 1L
      var levels = List(Array(si)) // per-level vertex lists, deepest first
      var frontier = Array(si)
      var iter = 0
      while (frontier.nonEmpty && iter < maxIter) {
        val cand = new mutable.LongMap[Long]()
        frontier.foreach { v =>
          g.outFrom(v).foreach { e =>
            val w = g.adj(e)
            if (level(w) < 0) cand.update(w.toLong, cand.getOrElse(w.toLong, 0L) + sigma(v))
          }
        }
        val next = new mutable.ArrayBuffer[Int]()
        cand.foreach { case (wi, sg) =>
          val w = wi.toInt
          level(w) = iter + 1; sigma(w) = sg; next += w
        }
        frontier = next.toArray
        if (frontier.nonEmpty) levels ::= frontier
        iter += 1
      }
      if (frontier.nonEmpty)
        throw new Algorithms.BudgetExhausted("betweennessLandmark", maxIter)
      // backward sweep, deepest level first; delta at the deepest level is 0
      val delta = new Array[Double](g.n)
      levels.foreach { lvlVerts =>
        // record this level's deltas into the global per-id sum
        lvlVerts.foreach { w =>
          dsum.update(g.ids(w), dsum.getOrElse(g.ids(w), 0.0) + delta(w))
        }
        val lvl = level(lvlVerts(0))
        if (lvl >= 2) {
          // contributions flow to level lvl−1 parents only
          val csum = new mutable.LongMap[Double]()
          lvlVerts.foreach { w =>
            val c = (1.0 + delta(w)) / sigma(w).toDouble
            var re = roff(w)
            while (re < roff(w + 1)) {
              val p = radj(re)
              if (level(p) == lvl - 1) csum.update(p.toLong, csum.getOrElse(p.toLong, 0.0) + c)
              re += 1
            }
          }
          // δ(p) = σ(p) · csum for EVERY level-(lvl−1) vertex (0 if none)
          csum.foreach { case (pi, c) => delta(pi.toInt) = c * sigma(pi.toInt).toDouble }
        }
      }
    }
    dsum
  }
}
