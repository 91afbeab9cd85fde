package graft

import org.apache.spark.sql.{Column, DataFrame}
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
object GraphDB {
  /** Session conf: refuse a `shortestPath` whose (pruned) seed set exceeds
    * this many sources — the guard on per-source-BFS state explosion at
    * scale. 0 disables the bound (and skips the count job). */
  val ShortestMaxSourcesKey = "spark.graft.shortest.maxSources"
  val DefaultShortestMaxSources = 1000000L
}

final class GraphDB(val graph: PropertyGraph, precomputed: Option[GraphStats] = None,
                    statsThunk: Option[() => GraphStats] = None) {

  /** `precomputed` wins, then `statsThunk` (a LAZY derivation — [[execute]]
    * uses it to update stats incrementally from the pre-mutation snapshot,
    * the reference's per-insert StatsStore contract without a graph scan),
    * else a full distributed recompute. */
  lazy val stats: GraphStats =
    precomputed.orElse(statsThunk.map(_())).getOrElse(graph.computeStats())

  /** Mutation at the GraphDB level returns a NEW GraphDB whose stats are
    * recomputed (lazily, on first plan) over the mutated graph — the
    * freshness contract the reference keeps by updating StatsStore per
    * insert (ConcurrentDirectedGraph.scala:121-124,151-152). The old
    * GraphDB keeps its snapshot, so in-flight plans are unaffected; going
    * through `graph.addNodes` directly and reusing the old GraphDB is the
    * one way to plan against stale stats, and PropertyGraph's scaladoc
    * says to rebuild. */
  def addNodes(rows: DataFrame): GraphDB = new GraphDB(graph.addNodes(rows))
  def addEdges(rows: DataFrame): GraphDB = new GraphDB(graph.addEdges(rows))

  def execute(text: String): GraphDB = execute(text, Map.empty[String, Any])

  /** Cypher write surface, compiled to the batch mutation API (reference
    * insertVertex/insertEdge, ConcurrentDirectedGraph.scala:109-153; the
    * delete/update forms are beyond the reference, whose matrices only
    * grow). Always returns a NEW GraphDB — immutable mutation contract:
    * the receiver and its stats snapshot are untouched.
    *
    *  - `CREATE (n:L {props})[, …]` — literal nodes and edges between them
    *  - `MATCH … [WHERE …] CREATE (a)-[:T {props}]->(b)` — one edge per
    *    DISTINCT match (the engine's set semantics), fully distributed
    *  - `MERGE …` — both CREATE forms made idempotent: literal nodes check
    *    existence (label + given props), edges anti-join the existing
    *    (src, dst, etype) keys before the append
    *  - `MATCH … SET b.prop = expr (, …)` — distributed column rewrite of
    *    the node table (expr may read the binding's own properties)
    *  - `MATCH … [DETACH] DELETE x (, …)` — anti-join removal of matched
    *    relationships and/or nodes; a non-DETACH node delete that would
    *    orphan relationships is refused (openCypher)
    *
    * Scale posture: literal node creation is driver-sized BY CONSTRUCTION
    * (the statement enumerates the rows), so id allocation is one tiny
    * max(id) job — the Spark analogue of the reference's AtomicLong id
    * counter (DataStore.scala:44-49); an explicit `id` property skips the
    * job. Per-match-row NODE creation is rejected loudly (bulk loads go
    * through addNodes with a real DataFrame); every per-match-row write
    * (edges, SET, DELETE) is one distributed plan — match → projected ids →
    * join/anti-join against the stored tables. */
  def execute(text: String, params: Map[String, Any]): GraphDB = {
    val stmt = CypherParser.parseWrite(text, params)
    if (stmt.sets.nonEmpty) runSet(stmt)
    else if (stmt.deletes.nonEmpty) runDelete(stmt)
    else runCreate(stmt)
  }

  /** The match of a write statement projected to `refs` (distinct). */
  private def matchFrame(stmt: cypher.Ast.WriteStmt, refs: Seq[String]): DataFrame =
    runQuery(cypher.Ast.Query(stmt.matchPaths, Seq.empty, stmt.where,
      refs.map(b => cypher.Ast.Ret(b)), distinct = true, Seq.empty, None))

  private def runCreate(stmt: cypher.Ast.WriteStmt): GraphDB = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val spark = graph.nodes.sparkSession
    val created = stmt.nodes.map(_.name)
    if (created.distinct.size != created.size)
      throw new cypher.ParseException("duplicate created binding in CREATE")
    val matchBound: Set[String] = stmt.matchPaths
      .flatMap(p => p.first.name.toSeq ++ p.hops.flatMap(_._2.name.toSeq)).toSet
    stmt.edges.flatMap(e => Seq(e.src, e.dst)).foreach { b =>
      if (!created.contains(b) && !matchBound(b)) throw new cypher.ParseException(
        s"CREATE endpoint $b is neither a created node nor a match binding")
    }
    if (stmt.matchPaths.nonEmpty && stmt.nodes.nonEmpty)
      throw new cypher.ParseException(
        "per-match-row node creation is not supported (CREATE after MATCH " +
          "creates relationships; bulk-load nodes with addNodes)")
    def norm(v: Any): Any = v match { case i: Int => i.toLong; case x => x }
    def sparkType(v: Any): DataType = norm(v) match {
      case _: String  => StringType
      case _: Long    => LongType
      case _: Double  => DoubleType
      case _: Boolean => BooleanType
      case other => throw new cypher.ParseException(
        s"unsupported CREATE property value: $other")
    }
    /** Literal rows → DataFrame whose shared columns are cast to `alignTo`'s
      * types (a LONG literal destined for a DOUBLE property column must not
      * fail the unionByName). */
    def literalDf(fixed: Seq[(String, DataType)], rows: Seq[Seq[Any]],
                  props: Seq[Seq[(String, Any)]], alignTo: DataFrame): DataFrame = {
      val keys = props.flatMap(_.map(_._1)).distinct
      val keyType = keys.map(k =>
        k -> sparkType(props.flatMap(_.collectFirst { case (`k`, v) => v }).head)).toMap
      val schema = StructType(
        fixed.map { case (n, t) => StructField(n, t, nullable = false) } ++
          keys.map(k => StructField(k, keyType(k), nullable = true)))
      val data = rows.zip(props).map { case (fx, ps) =>
        val m = ps.map { case (k, v) => k -> norm(v) }.toMap
        Row.fromSeq(fx.map(norm) ++ keys.map(m.get(_).orNull))
      }
      import scala.jdk.CollectionConverters._
      var df = spark.createDataFrame(data.asJava, schema)
      val existing = alignTo.schema.map(f => f.name -> f.dataType).toMap
      keys.foreach { k =>
        existing.get(k).foreach(t => if (t != keyType(k)) df = df.withColumn(k, col(k).cast(t)))
      }
      df
    }
    var pg = graph
    var idOf = Map.empty[String, Long]
    var createdNodes = Seq.empty[cypher.Ast.CreateNode]
    if (stmt.nodes.nonEmpty) {
      val explicitId: cypher.Ast.CreateNode => Option[Long] =
        n => n.props.collectFirst { case ("id", v: Long) => v; case ("id", v: Int) => v.toLong }
      // MERGE: a literal node that already exists (same label, every given
      // prop equal) binds its EXISTING id (edges may reference it) and is
      // not re-created. One tiny lookup per literal element — driver-sized
      // by construction.
      val knownCols = graph.nodes.schema.fieldNames.toSet
      val toCreate = stmt.nodes.filter { n =>
        if (!stmt.merge) true
        // a prop key the node table has never stored can match no existing
        // node — skip the lookup (filtering on the missing column would be
        // an AnalysisException) and take the create branch, consistent with
        // CREATE's unionByName(allowMissingColumns) handling of new columns
        else if (!n.props.forall { case (k, _) => knownCols(k) }) true
        else {
          val pred = n.props.foldLeft(col("label") === lit(n.label)) {
            case (p, (k, v)) => p && col(k) === lit(norm(v))
          }
          // lowest id wins when several stored nodes satisfy (label, props):
          // repeated runs must bind the same node (determinism contract)
          val hit = graph.nodes.filter(pred).select(col("id"))
            .orderBy(col("id")).limit(1).collect()
          if (hit.nonEmpty) { idOf += n.name -> hit(0).getLong(0); false } else true
        }
      }
      createdNodes = toCreate
      if (toCreate.nonEmpty) {
        val explicitIds = toCreate.flatMap(explicitId)
        if (explicitIds.distinct.size != explicitIds.size)
          throw new cypher.WriteConflictException(
            s"duplicate explicit id in CREATE: ${explicitIds.diff(explicitIds.distinct).head}")
        // an explicit id colliding with a stored node would silently corrupt
        // id-keyed joins — fail loudly (one tiny lookup, driver-sized input)
        if (explicitIds.nonEmpty) {
          val clash = graph.nodes.filter(col("id").isin(explicitIds: _*))
            .select(col("id")).orderBy(col("id")).limit(1).collect()
          if (clash.nonEmpty) throw new cypher.WriteConflictException(
            s"CREATE explicit id ${clash(0).getLong(0)} already exists in the node table")
        }
        var next =
          if (toCreate.forall(explicitId(_).isDefined)) 0L
          else {
            val r = graph.nodes.agg(max(col("id"))).collect()(0)
            (if (r.isNullAt(0)) -1L else r.getLong(0)) + 1L
          }
        // the allocator must never re-mint one of the statement's own
        // explicit ids: CREATE (a:L {id: 100}), (b:L) over max(stored) = 99
        // would otherwise assign 100 twice
        val taken = explicitIds.toSet
        val withIds = toCreate.map { n =>
          val id = explicitId(n).getOrElse {
            while (taken(next)) next += 1
            val v = next; next += 1; v
          }
          idOf += n.name -> id
          (id, n)
        }
        pg = pg.addNodes(literalDf(
          Seq("id" -> LongType, "label" -> StringType),
          withIds.map { case (id, n) => Seq[Any](id, n.label) },
          withIds.map(_._2.props.filterNot(_._1 == "id")), graph.nodes))
      }
    }
    val labelOfCreated = stmt.nodes.map(n => n.name -> n.label).toMap
    val (matchEdges, literalEdges) = stmt.edges.partition(
      e => matchBound(e.src) || matchBound(e.dst))
    var literalEdgeDf: Option[DataFrame] = None
    // persisted scratch frames, released via CacheLifecycle once the mutated
    // edge table is first acted on — a long-lived session issuing many write
    // statements must not accumulate cached blocks unboundedly
    var scratch = Seq.empty[DataFrame]
    if (literalEdges.nonEmpty) {
      val df0 = literalDf(
        Seq("src" -> LongType, "dst" -> LongType, "etype" -> StringType),
        literalEdges.map(e => Seq[Any](idOf(e.src), idOf(e.dst), e.etype)),
        literalEdges.map(_.props), graph.edges)
      // MERGE: only the keys not already stored are appended (idempotent)
      val df = if (!stmt.merge) df0
        else df0.join(graph.edges.select(col("src"), col("dst"), col("etype")),
          Seq("src", "dst", "etype"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (stmt.merge) scratch :+= df
      literalEdgeDf = Some(df)
      pg = pg.addEdges(df)
    }
    // match-created edges: the statement carries the endpoint labels when
    // the pattern declares them, so the stats delta is knowable without a
    // graph scan — only the created-pair COUNT needs a job, deferred into
    // the stats thunk. The pair set is persisted (lazily): the count job
    // and every later scan of the unioned edge table share one evaluation
    // of the match.
    val matchLabel: Map[String, Option[String]] = stmt.matchPaths
      .flatMap(p => (p.first +: p.hops.map(_._2)).flatMap(np => np.name.map(_ -> np.label)))
      .toMap
    var edgeDeltas = Seq.empty[(Option[String], String, Option[String], () => Long)]
    if (literalEdges.nonEmpty) {
      // labels of BOTH endpoints come from the statement (merge-matched
      // nodes declared theirs too). Under MERGE the per-group created count
      // is whatever survived the anti-join — one collect of the tiny
      // persisted frame, shared by every group's thunk.
      lazy val kept: Set[(Long, Long, String)] = literalEdgeDf.get
        .select("src", "dst", "etype").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      literalEdges.groupBy(e => (labelOfCreated(e.src), e.etype, labelOfCreated(e.dst)))
        .foreach { case ((sl, t, dl), es) =>
          edgeDeltas :+= ((Some(sl), t, Some(dl),
            if (!stmt.merge) () => es.size.toLong
            else () => es.count(e => kept((idOf(e.src), idOf(e.dst), e.etype))).toLong))
        }
    }
    if (matchEdges.nonEmpty) {
      val m = matchFrame(stmt, matchEdges.flatMap(e => Seq(e.src, e.dst)).distinct)
      matchEdges.foreach { e =>
        val pairs = m.select(col(e.src).as("src"), col(e.dst).as("dst"),
          lit(e.etype).as("etype")).dropDuplicates()
        val withProps = e.props.foldLeft(pairs) { case (df, (k, v)) =>
          val t = graph.edges.schema.find(_.name == k).map(_.dataType)
          df.withColumn(k, t.fold(lit(norm(v)))(tt => lit(norm(v)).cast(tt)))
        }
        // MERGE: anti-join the existing keys — the distributed idempotent
        // write (re-running the statement appends nothing)
        val appended = (if (!stmt.merge) withProps
          else withProps.join(graph.edges.select(col("src"), col("dst"), col("etype")),
            Seq("src", "dst", "etype"), "left_anti"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        scratch :+= appended
        pg = pg.addEdges(appended)
        edgeDeltas :+= ((matchLabel.getOrElse(e.src, None), e.etype,
          matchLabel.getOrElse(e.dst, None), () => appended.count()))
      }
    }
    // MERGE upsert clauses: each merge node takes ON CREATE SET when it was
    // created THIS statement, ON MATCH SET when it already existed — the
    // standard upsert. Values compile through the same per-row rewrite as
    // SET (own-property expressions); labels/ids are immutable.
    if (stmt.onCreateSets.nonEmpty || stmt.onMatchSets.nonEmpty) {
      val createdNames = createdNodes.map(_.name).toSet
      def validate(items: Seq[cypher.Ast.SetItem], clause: String): Unit = items.foreach { s =>
        if (!stmt.nodes.exists(_.name == s.binding)) throw new cypher.ParseException(
          s"$clause targets ${s.binding}, which is not a merged node in this statement")
        if (s.prop == "id" || s.prop == "label") throw new cypher.ParseException(
          s"$clause cannot change the core column ${s.prop}")
        cypher.Ast.Expr.refs(s.value).foreach { case (b, _) =>
          if (b != s.binding) throw new cypher.ParseException(
            s"$clause ${s.binding}.${s.prop}: the value may only read " +
              s"${s.binding}'s own properties (found $b)")
        }
      }
      validate(stmt.onCreateSets, "ON CREATE SET")
      validate(stmt.onMatchSets, "ON MATCH SET")
      val applicable =
        stmt.onCreateSets.filter(s => createdNames(s.binding)) ++
          stmt.onMatchSets.filter(s => !createdNames(s.binding))
      var nodesDf = pg.nodes
      applicable.foreach { s =>
        val id = idOf(s.binding)
        val existing = nodesDf.schema.find(_.name == s.prop).map(_.dataType)
        val raw = operators.Preds.exprColumn(s.value,
          (bb, pp) => if (pp.isEmpty) col("id") else col(pp))
        val v = existing.fold(raw)(t => raw.cast(t))
        nodesDf = nodesDf.withColumn(s.prop,
          if (existing.isDefined) when(col("id") === id, v).otherwise(col(s.prop))
          else when(col("id") === id, v))
      }
      pg = pg.withNodes(nodesDf)
    }
    // incremental stats (reference StatsStore per-insert updates,
    // ConcurrentDirectedGraph.scala:121-124,151-152): exact when every
    // created edge's endpoint labels are statically known; otherwise fall
    // back to the lazy full recompute. The thunk forces the RECEIVER's
    // stats (itself lazy) and folds the deltas in — no scan of the mutated
    // graph, which at 100 TB turns a CREATE from a full-corpus stats pass
    // into one bounded count of the created pairs.
    val exact = edgeDeltas.forall { case (sl, _, dl, _) => sl.isDefined && dl.isDefined }
    val thunk: Option[() => GraphStats] =
      if (!exact) None
      else Some(() => {
        val base = stats
        def bump[K](m: Map[K, Long], k: K, by: Long): Map[K, Long] =
          if (by == 0) m else m.updated(k, m.getOrElse(k, 0L) + by)
        var nc = base.nodeCounts
        createdNodes.foreach(n => nc = bump(nc, n.label, 1L))
        var ec = base.edgeCounts
        var tc = base.tripletCounts
        var eTotal = base.edgesTotal
        edgeDeltas.foreach { case (sl, t, dl, cnt) =>
          val c = cnt()
          ec = bump(ec, t, c)
          tc = bump(tc, (sl.get, t, dl.get), c)
          eTotal += c
        }
        GraphStats(base.nodesTotal + createdNodes.size, eTotal, nc, ec, tc)
      })
    // scratch caches do their whole job inside the first action that scans
    // the mutated edge table (the appended subtrees are in its lineage);
    // afterwards they release and later scans recompute — bounded memory
    // over a long write session (the CacheLifecycle default contract)
    if (scratch.nonEmpty)
      graft.util.CacheLifecycle.releaseOnFirstAction(pg.edges, scratch: _*)
    new GraphDB(pg, statsThunk = thunk)
  }

  /** `MATCH … SET b.prop = expr (, …)`: a distributed column rewrite —
    * matched ids left-join the node table, each SET prop becomes
    * `when(matched, value).otherwise(old)` (new columns null-fill outside
    * the match). The value expression may read the binding's OWN joined
    * property columns; stats are unchanged by construction (labels and
    * topology untouched), so the new GraphDB reuses the receiver's. */
  private def runSet(stmt: cypher.Ast.WriteStmt): GraphDB = {
    stmt.sets.foreach { s =>
      cypher.Ast.Expr.refs(s.value).foreach { case (b, _) =>
        if (b != s.binding) throw new cypher.ParseException(
          s"SET ${s.binding}.${s.prop}: the value may only read " +
            s"${s.binding}'s own properties (found $b)")
      }
      if (s.prop == "id" || s.prop == "label") throw new cypher.ParseException(
        s"SET cannot change the core column ${s.prop}")
    }
    val bindings = stmt.sets.map(_.binding).distinct
    val m = matchFrame(stmt, bindings)
    var nodesDf = graph.nodes
    bindings.foreach { b =>
      val ids = m.select(col(b).as("__set_id")).dropDuplicates()
      var joined = nodesDf.join(ids, nodesDf("id") === ids("__set_id"), "left")
      stmt.sets.filter(_.binding == b).foreach { s =>
        val existing = nodesDf.schema.find(_.name == s.prop).map(_.dataType)
        // REMOVE (SET to null) of an absent property is a no-op (openCypher)
        val isRemove = s.value == cypher.Ast.ELit(null)
        if (!(isRemove && existing.isEmpty)) {
          val raw = operators.Preds.exprColumn(s.value,
            (bb, pp) => if (pp.isEmpty) col("id") else col(pp))
          val v = existing.fold(raw)(t => raw.cast(t))
          joined = joined.withColumn(s.prop,
            if (existing.isDefined) when(col("__set_id").isNotNull, v).otherwise(col(s.prop))
            else when(col("__set_id").isNotNull, v))
        }
      }
      nodesDf = joined.drop("__set_id")
    }
    new GraphDB(graph.withNodes(nodesDf), statsThunk = Some(() => stats))
  }

  /** `MATCH … [DETACH] DELETE x (, …)`: distributed anti-join removal.
    * A relationship target removes the matched (src, dst, etype) keys in
    * the pattern's stored orientation (undirected matches remove both); a
    * node target removes the matched ids — refusing (openCypher) when
    * relationships would be orphaned unless DETACH, which removes the
    * incident edges too. Stats update INCREMENTALLY (base − deltas): the
    * deleted rows' label distribution is measured by joins against the
    * removed set only — work ∝ |deleted|, never a rescan of the surviving
    * graph (the CREATE path's per-insert StatsStore contract, mirrored). */
  private def runDelete(stmt: cypher.Ast.WriteStmt): GraphDB = {
    import cypher.Ast
    // relationship name → (srcBinding, relPat, dstBinding), walking each path
    val relInfo: Map[String, (Option[String], Ast.RelPat, Option[String])] =
      stmt.matchPaths.flatMap { p =>
        var prev = p.first
        p.hops.flatMap { case (rp, np) =>
          val entry = rp.name.map(n => n -> ((prev.name, rp, np.name)))
          prev = np
          entry
        }
      }.toMap
    val nodeNames: Set[String] = stmt.matchPaths
      .flatMap(p => p.first.name.toSeq ++ p.hops.flatMap(_._2.name.toSeq)).toSet
    val (relTargets, rest) = stmt.deletes.distinct.partition(relInfo.contains)
    val nodeTargets = rest.filter(nodeNames)
    rest.filterNot(nodeNames).foreach(t => throw new cypher.ParseException(
      s"DELETE target $t is not a bound node or relationship"))
    relTargets.map(relInfo).foreach { case (s, rp, d) =>
      if (rp.hops.isDefined) throw new cypher.ParseException(
        "DELETE of a variable-length relationship is not supported")
      if (s.isEmpty || d.isEmpty) throw new cypher.ParseException(
        "DELETE relationship requires named endpoints")
    }
    // The match carries each deleted relationship's IDENTITY out of the
    // query (startNode/endNode/type — the physical (src, dst, etype) of the
    // edge that matched, via the render path's identity join-back), so the
    // removal keys are EXACTLY the matched edges after the FULL WHERE. A
    // reconstruction from matched endpoint pairs would have to re-apply the
    // relationship's predicates to the stored table, and a conjunct mixing
    // the relationship's props with other bindings (e.g. WHERE x.w = 5 OR
    // b.v = 1) cannot be re-applied per-edge — it would over-delete a
    // declared-type edge whose own match row failed the WHERE while another
    // edge matched the same pair.
    val relRets = relTargets.flatMap(r => Seq(
      cypher.Ast.Ret(r, agg = Some("startnode"), alias = Some(s"__del_${r}_s")),
      cypher.Ast.Ret(r, agg = Some("endnode"), alias = Some(s"__del_${r}_d")),
      cypher.Ast.Ret(r, agg = Some("type"), alias = Some(s"__del_${r}_t"))))
    val m = runQuery(cypher.Ast.Query(stmt.matchPaths, Seq.empty, stmt.where,
        relRets ++ nodeTargets.map(n => cypher.Ast.Ret(n)),
        distinct = true, Seq.empty, None))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pg = graph
    var removedKeys = Seq.empty[DataFrame] // (src, dst, etype) removed keys
    var removedIds: Option[DataFrame] = None
    relTargets.foreach { r =>
      val keys = m.select(col(s"__del_${r}_s").as("src"),
          col(s"__del_${r}_d").as("dst"), col(s"__del_${r}_t").as("etype"))
        .dropDuplicates()
      pg = pg.removeEdges(keys)
      removedKeys :+= keys
    }
    if (nodeTargets.nonEmpty) {
      val ids = nodeTargets.map(n => m.select(col(n).as("id")))
        .reduce(_.unionByName(_)).dropDuplicates()
      val incident = pg.edges
        .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .select("src", "dst", "etype")
        .unionByName(pg.edges
          .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst", "etype"))
      if (!stmt.detach) {
        if (incident.limit(1).count() > 0) throw new cypher.ParseException(
          "DELETE would orphan relationships — use DETACH DELETE")
      } else {
        val inc = incident.dropDuplicates()
        pg = pg.removeEdges(inc)
        removedKeys :+= inc
      }
      pg = pg.removeNodes(ids)
      removedIds = Some(ids)
    }
    // incremental stats: measure the REMOVED rows (labels joined over the
    // pre-delete graph — work ∝ |deleted|) and subtract from the snapshot;
    // zeroed entries drop so the result is structurally identical to a
    // full recompute over the survivors.
    val thunk: () => GraphStats = () => {
      val base = stats
      val tripDeltas: Seq[((String, String, String), Long)] =
        if (removedKeys.isEmpty) Seq.empty
        else {
          val keys = removedKeys.map(_.select("src", "dst", "etype"))
            .reduce(_.unionByName(_)).dropDuplicates()
          val lab = graph.nodes.select(col("id"), col("label"))
          graph.edges.select("src", "dst", "etype")
            .join(keys, Seq("src", "dst", "etype"), "left_semi")
            .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "sl"), "src")
            .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "dl"), "dst")
            .groupBy("sl", "etype", "dl").count().collect()
            .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toSeq
        }
      val nodeDeltas: Seq[(String, Long)] = removedIds.fold(Seq.empty[(String, Long)])(ids =>
        graph.nodes.join(ids, Seq("id"), "left_semi").groupBy("label").count()
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      var nc = base.nodeCounts; var ec = base.edgeCounts; var tc = base.tripletCounts
      var eTot = base.edgesTotal; var nTot = base.nodesTotal
      tripDeltas.foreach { case ((sl, t, dl), c) =>
        ec = ec.updated(t, ec.getOrElse(t, 0L) - c)
        tc = tc.updated((sl, t, dl), tc.getOrElse((sl, t, dl), 0L) - c)
        eTot -= c
      }
      nodeDeltas.foreach { case (l, c) => nc = nc.updated(l, nc.getOrElse(l, 0L) - c); nTot -= c }
      GraphStats(nTot, eTot,
        nc.filter(_._2 != 0), ec.filter(_._2 != 0), tc.filter(_._2 != 0))
    }
    // the persisted match releases once the mutated edge table (whose
    // anti-join lineage contains it) is first acted on — bounded memory
    // over a long write session. NOTE (r14, built-measured-rejected):
    // caching the mutated graph (pg.cache()) to dedupe the read query's
    // per-leg removal subtrees made cy_delete SLOWER (4.4 → 5.8-7.3 s at
    // sf0.1) — the cache materializes every column of every row, while the
    // uncached legs push label filters + column pruning into the already-
    // cached BASE graph and recompute only narrow slices.
    graft.util.CacheLifecycle.releaseOnFirstAction(pg.edges, m)
    new GraphDB(pg, statsThunk = Some(thunk))
  }

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
   *
   * Laziness: construction is plan-only for every query form EXCEPT
   * `shortestPath`, whose seed-set guard runs one eager count job up front
   * (see [[runShortest]]) — the count doubles as the BFS seed-cache warm.
   */
  def query(cypherText: String): DataFrame = query(cypherText, Map.empty[String, Any])

  /** Parameterized form: `$name` placeholders resolve from `params` at
    * parse time (literal positions only — comparisons, expressions,
    * property maps, IN/UNWIND lists), so a `ref op $param` conjunct keeps
    * its pushdown classification. Types: String, Int/Long, Float/Double,
    * Seq of those for lists. */
  def query(cypherText: String, params: Map[String, Any]): DataFrame = {
    val (qs, all) = CypherParser.parseUnion(cypherText, params)
    if (qs.lengthIs == 1) return runQuery(qs.head)
    // openCypher: a trailing ORDER BY/SKIP/LIMIT after the LAST branch
    // applies to the WHOLE union (in openCypher a branch cannot carry its
    // own ORDER BY, so the conformant reading is unambiguous); earlier
    // branches keep the per-branch extension (top-k-per-branch).
    val last = qs.last
    val branches = qs.init :+ last.copy(orderBy = Seq.empty, limit = None, skip = None)
    val dfs = branches.map(runQuery)
    // UNION branches must agree on the output schema BY NAME (openCypher);
    // unionByName resolves each branch's internal projection order, so the
    // check is name-SET equality, not positional
    val names0 = dfs.head.columns.toSet
    dfs.tail.foreach { d =>
      if (d.columns.toSet != names0) throw new cypher.ParseException(
        s"UNION branches must return the same columns: " +
          s"${dfs.head.columns.mkString(",")} vs ${d.columns.mkString(",")}")
    }
    val u = dfs.reduce(_.unionByName(_))
    // UNION dedups across branches (the query-surface eWiseAdd over set
    // semantics); UNION ALL keeps every branch row
    val merged = if (all) u else u.dropDuplicates()
    // the final modifiers resolve sort keys exactly like a branch RETURN
    // (pre-alias default name or alias); unknown keys fail at parse level,
    // not as a Spark unresolved-column error
    val sortKeyToOut = cypher.Ast.Ret.sortKeyMap(last.returns)
    val unknownSort = last.orderBy.map(_.binding).filterNot(sortKeyToOut.contains)
    if (unknownSort.nonEmpty) throw new cypher.ParseException(
      s"ORDER BY over a UNION references non-returned columns: ${unknownSort.mkString(",")}" +
        (if (last.orderBy.exists(k => k.parts.isDefined && !sortKeyToOut.contains(k.binding)))
           " (non-returned sort properties are not supported over a UNION)" else ""))
    val ordered =
      if (last.orderBy.isEmpty) merged
      else merged.orderBy(last.orderBy.map { k =>
        val c = col(sortKeyToOut(k.binding))
        if (k.asc) c.asc else c.desc
      }: _*)
    val skipped = last.skip.fold(ordered)(ordered.offset)
    last.limit.fold(skipped)(skipped.limit)
  }

  private def runQuery(q0: cypher.Ast.Query): DataFrame =
    expandVarlenNamedPath(q0).getOrElse {
      val q = substPathLengths(q0)
      q.shortest match {
        case Some(sp) => runShortest(sp, q)
        case None =>
          if (q.unwindLit.isDefined) runUnwindLit(q)
          else if (q.unwindRange.isDefined) runUnwindRange(q)
          else if (q.withClauses.nonEmpty) runWith(q, q.withClauses)
          else run(Pattern.fromQuery(q))
      }
    }

  /** `length(p)` in a WHERE / expression position resolves to the named
    * path's CONSTANT hop count — for a varlen path per branch, since the
    * expansion recurses through here with each branch's rewritten
    * `namedPaths` (so `WHERE length(p) = 2` keeps exactly the 2-hop
    * branch: the other branches' filters fold to constant-false and
    * Catalyst prunes them to empty relations). Leftover length()
    * applications (unknown variable, a shortestPath variable, a non-path
    * argument) are rejected loudly; the bare ITEM form `RETURN length(p)`
    * takes the scalar-function path instead and is untouched. */
  private def substPathLengths(q: cypher.Ast.Query): cypher.Ast.Query = {
    import cypher.Ast
    val f: Ast.Expr => Ast.Expr = {
      case Ast.EFn("length", Seq(Ast.ERef(pv, _))) if q.namedPaths.contains(pv) =>
        Ast.ELit(q.namedPaths(pv)._2.size.toLong)
      case e => e
    }
    val q2 = q.copy(
      where = q.where.map(Ast.Pred.transformExprs(_)(f)),
      returns = q.returns.map(r => r.copy(expr = r.expr.map(Ast.Expr.transform(_)(f)))),
      withClauses = q.withClauses.map(w => w.copy(
        items = w.items.map(r => r.copy(expr = r.expr.map(Ast.Expr.transform(_)(f)))),
        where = w.where.map(Ast.Pred.transformExprs(_)(f)))))
    val leftover = (q2.where.flatMap(Ast.Pred.fns(_)) ++
      q2.returns.flatMap(_.expr.toSeq.flatMap(Ast.Expr.fns)) ++
      q2.withClauses.flatMap(w =>
        w.items.flatMap(_.expr.toSeq.flatMap(Ast.Expr.fns)) ++
          w.where.flatMap(Ast.Pred.fns(_))))
      .exists(_.name == "length")
    if (leftover) throw new cypher.ParseException(
      "length() in an expression takes a named path variable (MATCH p = …)")
    q2
  }

  /**
   * `MATCH p = (a)-[:T*lo..hi]->(b)` — a BOUNDED variable-length hop inside
   * a named path enumerates paths, not endpoint pairs (the bare varlen
   * Expand's walk semantics bind pairs and are kept for unnamed patterns).
   * Expansion: one fixed-length branch per length L in [lo, hi], the hop
   * unrolled into L single-hop relationships over fresh intermediate
   * bindings, `namedPaths` rewritten so nodes(p)/relationships(p)/length(p)
   * render per branch; branches union (set semantics — one row per distinct
   * path) and the final ORDER BY/SKIP/LIMIT apply post-union, exactly like
   * a UNION query. hi − lo + 1 branches of an already-planned shape — the
   * plan grows linearly with the bound, never with the data.
   *
   * @return None when the query has no varlen hop inside a named path
   */
  private def expandVarlenNamedPath(q: cypher.Ast.Query): Option[DataFrame] = {
    import cypher.Ast
    if (q.namedPaths.isEmpty) return None
    val pathRels: Set[String] = q.namedPaths.values.flatMap(_._2).toSet
    val varlenHops = q.paths.flatMap(_.hops).collect {
      case (r, _) if r.hops.isDefined && r.name.exists(pathRels) => r
    }
    if (varlenHops.isEmpty) return None
    if (varlenHops.sizeIs > 1) throw new cypher.ParseException(
      "at most one variable-length hop per named path query is supported")
    if (q.withClauses.nonEmpty) throw new cypher.ParseException(
      "a variable-length named path does not compose with WITH " +
        "(aggregate per fixed length or drop the path variable)")
    if (q.returns.exists(r => r.agg.exists(a => !plans.Pattern.ScalarFns(a))))
      throw new cypher.ParseException(
        "aggregates over a variable-length named path are not supported " +
          "(each length is a separate branch; aggregate over a fixed-length path)")
    val vr = varlenHops.head
    val relName = vr.name.get
    val (lo, hi) = vr.hops.get
    // allShortestPaths(p): the expansion additionally carries the declared
    // path's endpoint bindings + the branch length, and keeps per (src,
    // dst) pair only the minimum-length branches — every minimal path
    val ownerPv = q.namedPaths.find(_._2._2.contains(relName)).map(_._1)
    val isAllShortest = ownerPv.exists(q.allShortest)
    val (aspSrc, aspDst) = ownerPv.map { pv =>
      val ns = q.namedPaths(pv)._1; (ns.head, ns.last)
    }.getOrElse(("", ""))
    val extraItems =
      if (!isAllShortest) Seq.empty
      else Seq(Ast.Ret(aspSrc, alias = Some("__asp_src")),
        Ast.Ret(aspDst, alias = Some("__asp_dst")))
    val branches = (lo to hi).map { len =>
      val midName = (k: Int) => s"__vp_${relName}_${len}_$k"
      val relNameAt = (k: Int) => s"__vr_${relName}_${len}_$k"
      val newPaths = q.paths.map { p =>
        val idx = p.hops.indexWhere(_._1.name.contains(relName))
        if (idx < 0) p
        else {
          val (_, endNode) = p.hops(idx)
          val mids = (1 until len).map(k => Ast.NodePat(Some(midName(k)), None))
          val rels = (1 to len).map(k => vr.copy(hops = None, name = Some(relNameAt(k))))
          val newHops = rels.zip(mids :+ endNode)
          Ast.Path(p.first, p.hops.take(idx) ++ newHops ++ p.hops.drop(idx + 1))
        }
      }
      val np = q.namedPaths.map { case (pv, (ns, rs)) =>
        val ri = rs.indexOf(relName)
        if (ri < 0) pv -> ((ns, rs))
        else pv -> ((
          ns.take(ri + 1) ++ (1 until len).map(midName) ++ ns.drop(ri + 1),
          rs.take(ri) ++ (1 to len).map(relNameAt) ++ rs.drop(ri + 1)))
      }
      (q.copy(paths = newPaths, namedPaths = np, returns = q.returns ++ extraItems,
        orderBy = Seq.empty, limit = None, skip = None), len)
    }
    val dfs = branches.map { case (bq, len) =>
      val df = runQuery(bq)
      if (isAllShortest) df.withColumn("__asp_len", lit(len)) else df
    }
    // distinct paths across branches can never collide (their lengths
    // differ), but endpoint-only projections can — set semantics dedups
    val u0 = dfs.reduce(_.unionByName(_)).dropDuplicates()
    val u =
      if (!isAllShortest) u0
      else {
        // per-pair minimum over the union: one endpoint-keyed window —
        // state O(pairs × branch count), no join back
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__asp_src", "__asp_dst")
        u0.withColumn("__asp_min", min(col("__asp_len")).over(w))
          .filter(col("__asp_len") === col("__asp_min"))
          .drop("__asp_len", "__asp_min", "__asp_src", "__asp_dst")
          .dropDuplicates()
      }
    val sortKeyToOut = Ast.Ret.sortKeyMap(q.returns)
    val unknownSort = q.orderBy.map(_.binding).filterNot(sortKeyToOut.contains)
    if (unknownSort.nonEmpty) throw new cypher.ParseException(
      s"ORDER BY over a variable-length named path references non-returned " +
        s"columns: ${unknownSort.mkString(",")}")
    val ordered =
      if (q.orderBy.isEmpty) u
      else u.orderBy(q.orderBy.map { k =>
        val c = col(sortKeyToOut(k.binding))
        if (k.asc) c.asc else c.desc
      }: _*)
    val skipped = q.skip.fold(ordered)(ordered.offset)
    Some(q.limit.fold(skipped)(skipped.limit))
  }

  /**
   * `MATCH … WITH <items> [WHERE …] (WITH …)* RETURN …`: the FIRST stage
   * runs the match with its WITH items as the projection (full pushdown /
   * residual WHERE machinery applies before the pipe); each stage's WHERE
   * then filters that stage's OUTPUT rows (post-aggregation — SQL's HAVING
   * — referencing items by output name); every LATER stage (and the final
   * RETURN) projects or re-aggregates the previous stage's bare columns.
   * Post-WITH rows are plain rows, so a later `count(x)` counts rows
   * (openCypher), not the pre-WITH distinct-match semantics. The whole
   * chain stays one declarative plan — Catalyst sees N chained
   * project/aggregate/filter blocks, no materialization between stages.
   */
  private def runWith(q: cypher.Ast.Query, ws: Seq[cypher.Ast.WithClause]): DataFrame = {
    import graft.cypher.Ast
    val first = ws.head
    val stage1 = run(Pattern.fromQuery(q.copy(returns = first.items, distinct = first.distinct,
      orderBy = Seq.empty, limit = None, skip = None, withClauses = Seq.empty)))
    var cols = first.items.map(_.outName)
    var piped = stagePipe(stage1, cols, first)
    first.unwind.foreach { case (src, al) =>
      piped = piped.withColumn(al, explode(col(src))); cols = cols :+ al
    }
    ws.tail.foreach { w =>
      piped = projectStage(piped, cols, w.items, w.distinct, "WITH")
      cols = w.items.map(_.outName)
      piped = stagePipe(piped, cols, w)
      w.unwind.foreach { case (src, al) =>
        piped = piped.withColumn(al, explode(col(src))); cols = cols :+ al
      }
    }
    finishPipeline(piped, cols, q)
  }

  /** `UNWIND [lit, …] AS x (WITH …)* RETURN …`: a literal-list row source —
    * one explode over a single driver-side row, then the same bare-column
    * pipeline a WITH chain runs. Lists come back out via collect(); UNWIND
    * is its inverse (openCypher). */
  private def runUnwindLit(q: cypher.Ast.Query): DataFrame = {
    val (vals, alias) = q.unwindLit.get
    val spark = graph.nodes.sparkSession
    // array() picks the least common type (long+double → double); the
    // parser already rejected string/number mixes
    val src = spark.range(1).select(explode(array(vals.map(lit): _*)).as(alias))
    runBareSource(src, alias, q)
  }

  /** `UNWIND range(start, end[, step]) AS x (WITH …)* RETURN …`: the
    * DISTRIBUTED numeric row source — spark.range partitions the interval
    * across executors, so `range(1, 10^9)` never materializes a driver-side
    * list (the literal-list form would). Bounds inclusive (openCypher);
    * an empty interval yields no rows. */
  private def runUnwindRange(q: cypher.Ast.Query): DataFrame = {
    val (start, end, step, alias) = q.unwindRange.get
    val spark = graph.nodes.sparkSession
    // spark.range is end-EXCLUSIVE; openCypher range() is end-inclusive.
    // A bound pointing away from `end` yields the empty range (openCypher).
    // The ±1 below would overflow at Long.MaxValue/MinValue and silently
    // produce an empty/inverted interval — reject those bounds loudly.
    if ((step > 0 && end == Long.MaxValue) || (step < 0 && end == Long.MinValue))
      throw new cypher.ParseException(
        s"range() end bound $end would overflow the inclusive-bound shift " +
          "(Long.MaxValue/MinValue ends are not supported)")
    val stop = if (step > 0) end + 1 else end - 1
    val empty = (step > 0 && start > end) || (step < 0 && start < end)
    val src =
      if (empty) spark.range(0).select(col("id").as(alias))
      else spark.range(start, stop, step).select(col("id").as(alias))
    runBareSource(src, alias, q)
  }

  /** Shared pipeline tail for the non-MATCH row sources (UNWIND literal
    * list / range): WITH stages over bare columns, then the final RETURN. */
  private def runBareSource(src: DataFrame, alias: String,
                            q: cypher.Ast.Query): DataFrame = {
    var piped = src
    var cols = Seq(alias)
    q.withClauses.foreach { w =>
      piped = projectStage(piped, cols, w.items, w.distinct, "WITH")
      cols = w.items.map(_.outName)
      piped = stagePipe(piped, cols, w)
      w.unwind.foreach { case (src2, al) =>
        piped = piped.withColumn(al, explode(col(src2))); cols = cols :+ al
      }
    }
    finishPipeline(piped, cols, q)
  }

  /** Final RETURN over a pipeline's bare columns + ORDER BY/SKIP/LIMIT
    * (sort keys resolve like any RETURN: output name or pre-alias default). */
  private def finishPipeline(piped: DataFrame, cols: Seq[String],
                             q: cypher.Ast.Query): DataFrame = {
    import graft.cypher.Ast
    val distincted = projectStage(piped, cols, q.returns,
      distinct = q.distinct, stage = "RETURN")
    val sortKeyToOut = Ast.Ret.sortKeyMap(q.returns)
    val unknownSort = q.orderBy.map(_.binding).filterNot(sortKeyToOut.contains)
    if (unknownSort.nonEmpty) throw new cypher.ParseException(
      s"ORDER BY references non-returned columns: ${unknownSort.mkString(",")}")
    val ordered =
      if (q.orderBy.isEmpty) distincted
      else distincted.orderBy(q.orderBy.map { k =>
        val c = col(sortKeyToOut(k.binding)); if (k.asc) c.asc else c.desc
      }: _*)
    val skipped = q.skip.fold(ordered)(ordered.offset)
    q.limit.fold(skipped)(skipped.limit)
  }

  // HAVING-style filter over a stage's output columns (bare names only)
  private def havingFilter(df: DataFrame, cols: Seq[String],
                           where: Seq[cypher.Ast.Pred]): DataFrame = {
    import graft.cypher.Ast
    val colSet = cols.toSet
    where.foreach { p =>
      if (Ast.Pred.patterns(p).nonEmpty) throw new cypher.ParseException(
        "pattern predicates are not supported in WITH … WHERE " +
          "(apply them in the MATCH WHERE, before the pipeline)")
      if (Ast.Pred.patAggs(p).nonEmpty) throw new cypher.ParseException(
        "pattern expressions (size(pattern) / pattern comprehensions) are " +
          "MATCH-stage only — compute them in the first WITH items or the MATCH WHERE")
    }
    where.flatMap(Ast.Pred.refs(_)).foreach { case (b, p) =>
      if (p.nonEmpty) throw new cypher.ParseException(
        s"WITH … WHERE refers to output columns by bare name; $b.$p is not visible after WITH")
      if (!colSet(b)) throw new cypher.ParseException(
        s"WITH … WHERE references $b, not among the WITH items: ${cols.mkString(",")}")
    }
    where.foldLeft(df)((acc, p) =>
      acc.filter(operators.Preds.column(p, (b, _) => col(b))))
  }

  // project or re-aggregate a stage's bare columns (WITH stages ≥ 2 and
  // the final RETURN share this scope rule)
  private def projectStage(df: DataFrame, cols: Seq[String], items: Seq[cypher.Ast.Ret],
                           distinct: Boolean, stage: String): DataFrame = {
    import graft.cypher.Ast
      val colSet = cols.toSet
      items.foreach { r =>
        r.expr match {
          case Some(e) =>
            if (Ast.Expr.patAggs(e).nonEmpty) throw new cypher.ParseException(
              "pattern expressions (size(pattern) / pattern comprehensions) are " +
                "MATCH-stage only — compute them in the first WITH items " +
                s"(not in $stage over the pipeline)")
            Ast.Expr.refs(e).foreach { case (b, p) =>
              if (p.nonEmpty) throw new cypher.ParseException(
                s"$b.$p: property access is not available after WITH " +
                  "(project the property in the WITH items instead)")
              if (!colSet(b)) throw new cypher.ParseException(
                s"$stage references $b, not among the WITH items: ${cols.mkString(",")}")
            }
          case None =>
            if (r.prop.isDefined) throw new cypher.ParseException(
              s"${r.binding}.${r.prop.get}: property access is not available after WITH " +
                "(project the property in the WITH items instead)")
            // "*" is count(*)'s pseudo-binding (parser only emits it under count)
            if (r.binding != "*" && !colSet(r.binding)) throw new cypher.ParseException(
              s"$stage references ${r.binding}, not among the WITH items: ${cols.mkString(",")}")
        }
      }
      // value functions and general expressions are per-row scalars over the
      // stage's bare columns — grouping keys, not aggregates (same split as
      // Pattern.ScalarFns)
      def bareValue(i: Ast.Ret): Column = i.expr match {
        case Some(e) => operators.Preds.exprColumn(e, (b, _) => col(b))
        case None => i.agg match {
          // openCypher size() covers both strings and lists; the stage's
          // schema is known here, so a collect()ed array column counts its
          // elements instead of erroring on length()
          case Some("size") if df.schema.fields.exists(f =>
              f.name == i.binding &&
                f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) =>
            size(col(i.binding)).cast("long")
          case Some(f) if operators.Preds.valueFn.contains(f) =>
            operators.Preds.valueFn(f)(col(i.binding))
          case _ => col(i.binding)
        }
      }
      val aggItems = items.filter(i =>
        i.agg.exists(a => !operators.Preds.valueFn.contains(a)))
      val groupItems = items.filterNot(aggItems.contains)
      val projected =
        if (aggItems.isEmpty) df.select(items.map(i => bareValue(i).as(i.outName)): _*)
        else {
          val aggs = aggItems.map { i =>
            // the aggregate's argument: a bare stage column, or a general
            // expression over stage columns (`sum(a * b)`)
            val arg = i.expr.fold(col(i.binding))(e =>
              operators.Preds.exprColumn(e, (b, _) => col(b)))
            (i.agg.get match {
              case "count" =>
                if (i.binding == "*") count(lit(1))
                else if (i.aggDistinct) countDistinct(col(i.binding))
                else count(col(i.binding))
              case "sum" => if (i.aggDistinct) sum_distinct(arg) else sum(arg)
              // DISTINCT is a no-op under min/max; avg needs the SQL form
              case "min" => min(arg)
              case "max" => max(arg)
              case "avg" =>
                if (i.aggDistinct) expr(s"avg(DISTINCT `${i.binding}`)") else avg(arg)
              // sorted array = deterministic rendering of the collection;
              // DISTINCT folds to the value set first
              case "collect" =>
                if (i.aggDistinct) sort_array(collect_set(arg))
                else sort_array(collect_list(arg))
              case "stdev"  => stddev_samp(arg)
              case "stdevp" => stddev_pop(arg)
              case "percentilecont" => percentile(arg, lit(i.aggParam.get))
              case "percentiledisc" =>
                percentile_approx(arg, lit(i.aggParam.get), lit(Int.MaxValue))
              case other => throw new cypher.ParseException(s"$other() is not supported after WITH")
            }).as(i.outName)
          }
          if (groupItems.isEmpty) df.agg(aggs.head, aggs.tail: _*)
          else df.groupBy(groupItems.map(i => bareValue(i).as(i.outName)): _*)
            .agg(aggs.head, aggs.tail: _*)
        }
      if (distinct && aggItems.isEmpty) projected.dropDuplicates() else projected
    }

  // per-stage ORDER BY/SKIP/LIMIT (openCypher top-k-then-continue),
  // applied AFTER the stage's WHERE; sort keys resolve like RETURN's
  private def stageMods(df: DataFrame, items: Seq[cypher.Ast.Ret],
                        orderBy: Seq[cypher.Ast.SortKey],
                        skip: Option[Int], limit: Option[Int]): DataFrame = {
    if (orderBy.isEmpty && skip.isEmpty && limit.isEmpty) return df
    val keyToOut = cypher.Ast.Ret.sortKeyMap(items)
    val unknown = orderBy.map(_.binding).filterNot(keyToOut.contains)
    if (unknown.nonEmpty) throw new cypher.ParseException(
      s"WITH … ORDER BY references columns not among the items: ${unknown.mkString(",")}")
    val ordered =
      if (orderBy.isEmpty) df
      else df.orderBy(orderBy.map { k =>
        val c = col(keyToOut(k.binding)); if (k.asc) c.asc else c.desc
      }: _*)
    val skipped = skip.fold(ordered)(ordered.offset)
    limit.fold(skipped)(skipped.limit)
  }

  // WHERE and ORDER BY/SKIP/LIMIT apply in the textual order the stage
  // wrote them: WHERE-first filters before the top-k, openCypher's
  // trailing WHERE filters the top-k result
  private def stagePipe(df: DataFrame, cols: Seq[String],
                        w: cypher.Ast.WithClause): DataFrame =
    if (w.whereAfterMods)
      havingFilter(stageMods(df, w.items, w.orderBy, w.skip, w.limit), cols, w.where)
    else
      stageMods(havingFilter(df, cols, w.where), w.items, w.orderBy, w.skip, w.limit)

  /**
   * `MATCH p = shortestPath((a)-[:T*]->(b))`: per endpoint pair, the
   * minimum path length over the typed edges — compiled to a per-source
   * BFS ([[graft.algorithms.Algorithms.bfsPerSource]]) instead of the
   * pattern planner: BFS converges level by level, so the unbounded `*`
   * that the varlen Expand must reject is exactly what it handles, and the
   * level it first reaches a vertex at IS the shortest length (no min-agg
   * over an unrolled walk table). RETURN supports the endpoint bindings,
   * their properties, and `length(p)`.
   *
   * SOURCE-SET BOUND: per-source BFS state is O(|sources| × reachability) —
   * an unselective source label on a 100×-scale graph is a state explosion
   * no partitioning fixes. The seed set (after the out-edge semi-join
   * prune) is therefore counted up front and the query REFUSES loudly past
   * [[GraphDB.ShortestMaxSourcesKey]] (default 1,000,000) instead of
   * grinding the cluster down: narrow the source label, or raise/disable
   * the conf (0 = unbounded) when the state budget is a deliberate choice.
   * The count is one node-scan + semi-join job — noise next to the BFS it
   * guards, and the landmark estimator ([[graft.algorithms.Algorithms
   * .harmonicLandmark]]) is the sampled alternative when all-sources
   * distances were the goal.
   */
  private def runShortest(sp: cypher.Ast.Shortest, q: cypher.Ast.Query): DataFrame = {
    import graft.cypher.Ast
    val srcName = sp.src.name.getOrElse("__src")
    val dstName = sp.dst.name.getOrElse("__dst")
    val lenName = s"length_${sp.pathVar}"
    q.returns.foreach { r =>
      if (r.expr.isDefined) throw new cypher.ParseException(
        "value expressions are not supported with shortestPath")
      r.agg match {
        case Some("length") =>
          if (r.binding != sp.pathVar) throw new cypher.ParseException(
            s"length(${r.binding}): unknown path variable (expected ${sp.pathVar})")
        case Some(a) => throw new cypher.ParseException(
          s"$a() is not supported with shortestPath")
        case None =>
          if (r.binding != srcName && r.binding != dstName)
            throw new cypher.ParseException(
              s"unknown binding ${r.binding} in shortestPath RETURN")
      }
    }
    val base = graph.edgesByType(sp.rel.types).select(col("src"), col("dst"))
    val e = sp.rel.dir match {
      case Ast.Out  => base
      case Ast.In   => base.select(col("dst").as("src"), col("src").as("dst"))
      case Ast.Both => base.unionByName(base.select(col("dst").as("src"), col("src").as("dst")))
    }
    // only sources with a qualifying out-edge can ever reach anything at
    // level ≥ 1 — the semi-join prunes the level-0 seed state the BFS
    // carries through every round (an unlabeled source pattern otherwise
    // seeds EVERY node: 186k seeds for 16k movers at sf0.1)
    // persisted so the guard's count materializes the seed set ONCE and the
    // BFS below reuses it instead of re-running the node⋉edge semi-join
    // (r6 shipped this uncached: cy_shortest paid the semi-join twice, 3.3×);
    // released by the releaseOnFirstAction hook on the returned result
    val srcIds = sp.src.label.fold(graph.nodes)(graph.nodesByLabel).select(col("id"))
      .join(e.select(col("src").as("id")), Seq("id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = graph.nodes.sparkSession
    val maxSources = spark.conf.getOption(GraphDB.ShortestMaxSourcesKey)
      .map(v => try v.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"${GraphDB.ShortestMaxSourcesKey} must be a long, got '$v'") })
      .getOrElse(GraphDB.DefaultShortestMaxSources)
    if (maxSources > 0) {
      val nSrc = srcIds.count()
      if (nSrc > maxSources) {
        srcIds.unpersist(blocking = false)
        throw new IllegalStateException(
          s"shortestPath seeds $nSrc sources (label ${sp.src.label.getOrElse("<any>")}); " +
            s"per-source BFS state is O(sources × reachability) and the configured bound is " +
            s"$maxSources (${GraphDB.ShortestMaxSourcesKey}; 0 disables). Narrow the source " +
            "label, or raise the bound if this state budget is deliberate.")
      }
    }
    val dstIds = sp.dst.label.fold(graph.nodes)(graph.nodesByLabel).select(col("id"))
    val (lo, hi) = sp.rel.hops.getOrElse((1, 1))
    val matches = graft.algorithms.Algorithms.bfsPerSource(e, srcIds)
      .filter(col("level") >= lo && col("level") <= hi) // drops the level-0 seeds
      .join(dstIds, Seq("id"), "left_semi")
      .select(col("src").as(srcName), col("id").as(dstName),
        col("level").cast("long").as(lenName))
    val propsNeeded = q.returns.filter(r => r.agg.isEmpty && r.prop.isDefined)
      .groupBy(_.binding).view.mapValues(_.flatMap(_.prop).distinct).toMap
    val withProps = propsNeeded.foldLeft(matches) { case (acc, (b, ps)) =>
      val sel = graph.nodes.select(
        (col("id").as(b) +: ps.map(p => col(p).as(s"${b}_$p"))): _*)
      acc.join(sel, Seq(b), "left")
    }
    def valueOf(i: Ast.Ret): Column =
      if (i.agg.contains("length")) col(lenName)
      else i.prop.fold(col(i.binding))(p => col(s"${i.binding}_$p"))
    val projected = withProps.select(q.returns.map(i => valueOf(i).as(i.outName)): _*)
    val distincted = if (q.distinct) projected.dropDuplicates() else projected
    // ORDER BY accepts the pre-alias default name of a renamed item, same
    // contract as the pattern path (Pattern.fromQuery's sortKeyToOut);
    // unknown keys fail loudly, not as a Spark unresolved-column error
    val sortKeyToOut = Ast.Ret.sortKeyMap(q.returns)
    val unknownSort = q.orderBy.map(_.binding).filterNot(sortKeyToOut.contains)
    if (unknownSort.nonEmpty) throw new cypher.ParseException(
      s"ORDER BY references non-returned columns: ${unknownSort.mkString(",")}")
    val ordered =
      if (q.orderBy.isEmpty) distincted
      else distincted.orderBy(q.orderBy.map { k =>
        val c = col(sortKeyToOut(k.binding))
        if (k.asc) c.asc else c.desc
      }: _*)
    val skipped = q.skip.fold(ordered)(ordered.offset)
    val result = q.limit.fold(skipped)(skipped.limit)
    // first action on the result releases the seed cache (bfsPerSource has
    // already consumed it eagerly; the lineage of shallow BFS runs — fewer
    // iterations than the Cutter's checkpoint stride — may still read it)
    graft.util.CacheLifecycle.releaseOnFirstAction(result, srcIds)
  }

  private def run(pg0: Pattern.PatternGraph): DataFrame = {
    // pattern-valued expressions (size(pattern) / pattern comprehensions):
    // each DISTINCT one compiles as its own grouped sub-match (below,
    // patAggFrame) joined back on its anchor bindings; here the expression
    // trees are rewritten to read the joined column (a bare __paggN ref),
    // so every downstream compile stage sees ordinary references
    val patAggList =
      (pg0.items.flatMap(_.expr.toSeq.flatMap(cypher.Ast.Expr.patAggs)) ++
        pg0.residual.flatMap(cypher.Ast.Pred.patAggs(_))).distinct
    val patAggCol = patAggList.zipWithIndex
      .map { case (pa, ix) => pa -> s"__pagg$ix" }.toMap
    val patAggRewrite: cypher.Ast.Expr => cypher.Ast.Expr = {
      case pa: cypher.Ast.EPatAgg => cypher.Ast.ERef(patAggCol(pa), None)
      case other => other
    }
    val pg =
      if (patAggList.isEmpty) pg0
      else pg0.copy(
        items = pg0.items.map(i =>
          i.copy(expr = i.expr.map(cypher.Ast.Expr.transform(_)(patAggRewrite)))),
        residual = pg0.residual.map(cypher.Ast.Pred.transformExprs(_)(patAggRewrite)))
    // item-side pattern aggs anchor the RESULT granularity (they behave
    // like a property read of their anchors), so those anchors join
    // baseNeeded — the dedup keys — not just the carry set
    val itemPatAggAnchors =
      pg0.items.flatMap(_.expr.toSeq.flatMap(cypher.Ast.Expr.patAggs))
        .flatMap(pa => (pa.pat.path.first.name.toSeq ++
          pa.pat.path.hops.flatMap(_._2.name)).distinct.filter(pg0.bindings))
    // the required pattern must carry everything the result needs from it,
    // plus every optional group's join keys, plus the bindings the residual
    // WHERE predicates read (possibly beyond the returned set). A residual
    // ref to a RELATIONSHIP variable carries the edge's two endpoint
    // bindings instead — the property value joins back on that pair.
    // path functions read through the path's member bindings: nodes(p)
    // carries every node binding on the path, relationships(p) every
    // relationship's identity columns (length(p) is a constant)
    val pathNodeNeeds = pg.items.filter(_.agg.contains("nodes"))
      .flatMap(i => pg.namedPaths.get(i.binding).toSeq.flatMap(_._1)).distinct
    val pathRelNames = pg.items.filter(_.agg.contains("relationships"))
      .flatMap(i => pg.namedPaths.get(i.binding).toSeq.flatMap(_._2)).distinct
    val baseNeeded =
      (pg.referenced.filter(pg.bindings) ++ pg.optional.flatMap(_.shared) ++
        pathNodeNeeds ++ itemPatAggAnchors).distinct
    val edgeByName = pg.edges.flatMap(e => e.name.map(_ -> e)).toMap
    // expression items read (binding, prop) pairs — node refs join like
    // item properties, edge refs like residual edge refs; bare refs (prop
    // "") resolve to the binding's id column, already carried
    val exprRefs = pg.items.flatMap(_.expr.toSeq.flatMap(cypher.Ast.Expr.refs)).distinct
    val (exprEdgeRefs, exprNodeRefs) = exprRefs.partition(r => edgeByName.contains(r._1))
    // RETURN r.prop / agg(r.prop) on a single-hop relationship variable:
    // rendered by the same endpoint-pair join-back as residual edge refs
    val itemEdgeRefs = (pg.items.filter(i => i.prop.isDefined && edgeByName.contains(i.binding))
      .map(i => i.binding -> i.prop.get) ++ exprEdgeRefs.filter(_._2.nonEmpty)).distinct
    // keys(b) bindings from every position: bare item form, expression
    // items, residual predicates. Node bindings join ALL node property
    // columns back (the present-key list reads their null-ness); a
    // RELATIONSHIP binding does the same over the edge table's property
    // columns via the identity join-back below.
    val allKeysBindings =
      (pg.items.filter(_.agg.contains("keys")).map(_.binding) ++
        (pg.items.flatMap(_.expr.toSeq.flatMap(cypher.Ast.Expr.fns)) ++
          pg.residual.flatMap(cypher.Ast.Pred.fns(_)))
          .collect { case cypher.Ast.EFn("keys", Seq(cypher.Ast.ERef(b, _))) => b }).distinct
    val keysEdgeNames = allKeysBindings.filter(edgeByName.contains)
    // type(r)/startNode(r)/endNode(r)/keys(r) project the matched
    // relationship's identity (and, for keys, property) columns — same
    // identity join-back; the dedup below keys on which edge matched
    val typeRefNames = (pg.items
      .filter(_.agg.exists(Set("type", "startnode", "endnode")))
      .map(_.binding) ++ pathRelNames ++ keysEdgeNames).distinct
    val resRefs = pg.residual.flatMap(cypher.Ast.Pred.refs(_)).distinct
    val (resEdgeRefs, resNodeRefs) = resRefs.partition(r => edgeByName.contains(r._1))
    val edgeRefNames =
      (resEdgeRefs.map(_._1) ++ itemEdgeRefs.map(_._1) ++ typeRefNames).distinct
    // pattern predicates anchor on main-pattern bindings — carried through
    // the match so the semi/anti/flag joins below have their key columns
    val patPreds = pg.residual.flatMap(cypher.Ast.Pred.patterns(_)).distinct
    def patAnchors(pp: cypher.Ast.PatPred): Seq[String] =
      (pp.path.first.name.toSeq ++ pp.path.hops.flatMap(_._2.name))
        .distinct.filter(pg.bindings)
    // __paggN refs resolve to columns JOINED below, never to match
    // bindings; their sub-patterns' anchor bindings must be carried instead
    val resBindings = (resNodeRefs.map(_._1).filterNot(patAggCol.valuesIterator.toSet) ++
      edgeRefNames.map(edgeByName).flatMap(e => Seq(e.src, e.dst)) ++
      patPreds.flatMap(patAnchors) ++
      patAggList.flatMap(pa => patAnchors(pa.pat))).distinct
    val mainNeeded = (baseNeeded ++ resBindings).distinct
    val mainPg = pg.copy(items = mainNeeded.map(b => cypher.Ast.Ret(b)),
      optional = Seq.empty, distinct = false, orderBy = Seq.empty, limit = None,
      skip = None, residual = Seq.empty)
    val root = Planner.plan(mainPg, stats)
    val c = PatternExec.compileTracked(root, graph)
    val projected = c.df.select(mainNeeded.map(col): _*)
    val mainMatches =
      if (c.distinct && mainNeeded.toSet == root.carried) projected
      else projected.dropDuplicates()
    // OPTIONAL MATCH: each group plans + compiles as its own pattern
    // (stats-ordered like the main one), dedups to its distinct matches,
    // and LEFT-joins on the shared bindings — unmatched rows keep nulls,
    // multiple optional matches fan the row out (one row per distinct
    // combined match, the same set semantics as the required part)
    val matches = pg.optional.foldLeft(mainMatches) { (acc, g) =>
      val fragNeeded =
        (g.shared ++ pg.referenced.filter(b => g.bindings(b) && !pg.bindings(b))).distinct
      val fragPg = Pattern.PatternGraph(g.labels, g.edges, g.preds,
        fragNeeded.map(b => cypher.Ast.Ret(b)), distinct = false, Seq.empty, None,
        edgePredicates = g.edgePreds)
      val fr = Planner.plan(fragPg, stats)
      val fc = PatternExec.compileTracked(fr, graph)
      val fproj = fc.df.select(fragNeeded.map(col): _*)
      val fded =
        if (fc.distinct && fragNeeded.toSet == fr.carried) fproj
        else fproj.dropDuplicates()
      acc.join(fded, g.shared, "left")
    }
    // property access: one broadcast-friendly join per binding that needs
    // values — for RETURN items AND residual WHERE predicates — AFTER the
    // set-semantics dedup so each distinct match contributes its property
    // exactly once (left join: ids always resolve — PropertyGraph invariant
    // — but stay robust to partial node tables)
    // labels(n) renders the node's `label` column (single-label model) —
    // it rides the same property join-back as any node property
    val labelsRefs = pg.items.filter(_.agg.contains("labels"))
      .map(i => i.binding -> "label")
    // keys(n) needs EVERY property column of the node joined back (the
    // present-key list is computed per row from their null-ness) — both the
    // bare item form (Ret.agg) and the expression form (EFn("keys", …)
    // inside an item expression or a residual predicate)
    val nodePropCols = graph.nodes.columns.toSeq.filter(c => c != "id" && c != "label").sorted
    val edgePropCols = graph.edges.columns.toSeq
      .filterNot(Set("src", "dst", "etype")).sorted
    val keysRefs = allKeysBindings.filterNot(edgeByName.contains)
      .flatMap(b => nodePropCols.map(b -> _))
    val itemProps = pg.items
      .filter(i => i.prop.isDefined && !edgeByName.contains(i.binding))
      .map(i => i.binding -> i.prop.get) ++ exprNodeRefs.filter(_._2.nonEmpty) ++
      labelsRefs ++ keysRefs
    // bare refs (prop "") are id columns, not property joins
    val propsNeeded = (itemProps ++ resNodeRefs).distinct.filter(_._2.nonEmpty)
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val withNodeProps = propsNeeded.foldLeft(matches) { case (acc, (b, ps)) =>
      val sel = graph.nodes.select(
        (col("id").as(b) +: ps.map(p => col(p).as(s"${b}_$p"))): _*)
      acc.join(sel, Seq(b), "left")
    }
    // relationship properties referenced by residual predicates or RETURN
    // items join back on the edge's endpoint pair — 1:1 per type by the
    // (src,dst,etype) uniqueness invariant. Multi-type or undirected rels
    // can fan a pair out to one row per matching relationship. Each joined
    // row carries the relationship's IDENTITY (__rel_<r>_{s,d,t}: physical
    // src/dst/etype) so the granularity dedup below keys on which
    // relationship matched, never on property values (two distinct
    // relationships sharing a value must both contribute to aggregates).
    // keys(r) needs EVERY edge property column of the relationship
    val edgePropsNeeded0 =
      (resEdgeRefs.filter(_._2.nonEmpty) ++ itemEdgeRefs ++
        keysEdgeNames.flatMap(r => edgePropCols.map(r -> _)))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    // type()-only relationships join just their identity columns back
    val edgePropsNeeded = edgePropsNeeded0 ++
      typeRefNames.filterNot(edgePropsNeeded0.contains).map(_ -> Seq.empty[String])
    val withAllProps = edgePropsNeeded.foldLeft(withNodeProps) { case (acc, (r, ps)) =>
      val e = edgeByName(r)
      // the relationship's PUSHED WHERE conjuncts re-apply here: the match
      // narrowed the endpoint PAIRS, but this join-back re-fans each pair
      // to every stored declared-type edge — without the filter, a parallel
      // edge that failed the predicate would resurface with its type/props
      // (e.g. MATCH (a)-[x:X|Z]->(b) WHERE x.w = 5 RETURN type(x) must not
      // render the Z edge of a pair whose X edge matched; runDelete keys
      // edge removal on these identity columns, so it would over-delete).
      val base = pg.edgePredicates.filter(_.binding == r)
        .foldLeft(graph.edgesByType(e.types))((df, p) =>
          df.filter(operators.Preds.column(p, (_, pr) => col(pr))))
      def sel(df: DataFrame, srcAs: String, dstAs: String) = df.select(
        (Seq(col("src").as(srcAs), col("dst").as(dstAs),
          col("src").as(s"__rel_${r}_s"), col("dst").as(s"__rel_${r}_d"),
          col("etype").as(s"__rel_${r}_t")) ++
          ps.map(p => col(p).as(s"${r}_$p"))): _*)
      val joined =
        if (!e.undirected) sel(base, e.src, e.dst)
        // reversed orientation excludes self-loops: (v,v) already matches
        // the forward copy, and a duplicate would fan the pair out twice
        else sel(base, e.src, e.dst)
          .unionByName(sel(base.filter(col("src") =!= col("dst")), e.dst, e.src))
      acc.join(joined, Seq(e.src, e.dst), "left")
    }
    // pattern predicates: each distinct pattern plans and compiles as its
    // own existential sub-pattern (stats-ordered, like an OPTIONAL MATCH
    // fragment), projected to its anchor bindings. A bare conjunct becomes
    // a LEFT SEMI join (exists), a NOT-ed conjunct a LEFT ANTI join (not
    // exists) — neither fans rows out nor widens the row, and Catalyst
    // broadcasts the (anchor-projected) build side when small. Only a
    // pattern nested deeper (under OR / inside a conjunction) pays the
    // exists-flag left join: distinct anchor keys, so strictly 1:1.
    def existsFrame(pp: cypher.Ast.PatPred): (DataFrame, Seq[String]) = {
      // an unlabeled anchor inherits the main pattern's label constraint —
      // narrows the existential scan for free (the anchor's VALUES are
      // already label-constrained by the outer match, so this is purely a
      // scan-size optimization, never a semantics change)
      def seed(n: cypher.Ast.NodePat): cypher.Ast.NodePat =
        if (n.label.isEmpty) n.copy(label = n.name.flatMap(pg.labels.get).flatten) else n
      val seeded = cypher.Ast.Path(seed(pp.path.first),
        pp.path.hops.map { case (r, n) => (r, seed(n)) })
      val anchors = patAnchors(pp)
      val sub = cypher.Ast.Query(Seq(seeded), Seq.empty, pp.preds,
        anchors.map(b => cypher.Ast.Ret(b)), distinct = false, Seq.empty, None)
      val sc = PatternExec.compileTracked(Planner.plan(Pattern.fromQuery(sub), stats), graph)
      (sc.df.select(anchors.map(col): _*), anchors)
    }
    val (bareSemi, rest0) = pg.residual.partition(_.isInstanceOf[cypher.Ast.PatPred])
    val (bareAnti, restResidual) = rest0.partition {
      case cypher.Ast.Not(_: cypher.Ast.PatPred) => true
      case _ => false
    }
    val withSemi = bareSemi.foldLeft(withAllProps) { (acc, p) =>
      val (df, keys) = existsFrame(p.asInstanceOf[cypher.Ast.PatPred])
      acc.join(df, keys, "left_semi")
    }
    val withAnti = bareAnti.foldLeft(withSemi) { (acc, p) =>
      val cypher.Ast.Not(pp: cypher.Ast.PatPred) = p: @unchecked
      val (df, keys) = existsFrame(pp)
      acc.join(df, keys, "left_anti")
    }
    val nestedPats = restResidual.flatMap(cypher.Ast.Pred.patterns(_)).distinct
    val patFlag = nestedPats.zipWithIndex.map { case (pp, ix) => pp -> s"__pp$ix" }.toMap
    val withPatFlags = nestedPats.foldLeft(withAnti) { (acc, pp) =>
      val (df, keys) = existsFrame(pp)
      acc.join(df.dropDuplicates().withColumn(patFlag(pp), lit(true)), keys, "left")
    }
    // pattern-valued expressions: one grouped sub-match per distinct
    // size(pattern) / pattern comprehension, joined 1:1 on its anchors.
    // The sub-match compiles through the FULL pipeline recursively (its own
    // stats-ordered plan, predicate pushdown, property join-backs for the
    // projection), then one combinable groupBy per anchor set; an outer row
    // with no matches reads the default (0 / typed empty array). Anonymous
    // pattern nodes are auto-named first so every distinct intermediate
    // assignment counts as a match (the set-semantics analogue of
    // openCypher's per-path counting; parallel same-endpoint relationships
    // still collapse — the engine-wide Boolean-matrix contract).
    def patAggFrame(pa: cypher.Ast.EPatAgg, outCol: String): (DataFrame, Seq[String]) = {
      import cypher.Ast
      var n = 0
      def named(np: Ast.NodePat): Ast.NodePat =
        if (np.name.isDefined) np else { n += 1; np.copy(name = Some(s"__pae$n")) }
      def seedL(np: Ast.NodePat): Ast.NodePat =
        if (np.label.isEmpty) np.copy(label = np.name.flatMap(pg.labels.get).flatten)
        else np
      val p0 = pa.pat.path
      val path = Ast.Path(seedL(named(p0.first)),
        p0.hops.map { case (r, np) => (r, seedL(named(np))) })
      val anchors = patAnchors(pa.pat)
      val nodeBindings =
        (path.first.name.toSeq ++ path.hops.flatMap(_._2.name)).distinct
      val items = nodeBindings.map(b => Ast.Ret(b)) ++
        pa.map.map(m => Ast.Ret("", expr = Some(m), alias = Some("__pv"))).toSeq
      val sub = Ast.Query(Seq(path), Seq.empty, pa.pat.preds, items,
        distinct = false, Seq.empty, None)
      val frame = run(Pattern.fromQuery(sub))
      val grouped = (pa.kind, anchors) match {
        case ("count", Seq()) => frame.agg(count(lit(1)).as(outCol))
        case ("count", as)    =>
          frame.groupBy(as.map(col): _*).agg(count(lit(1)).as(outCol))
        case (_, Seq())       =>
          frame.agg(sort_array(collect_list(col("__pv"))).as(outCol))
        case (_, as)          =>
          frame.groupBy(as.map(col): _*)
            .agg(sort_array(collect_list(col("__pv"))).as(outCol))
      }
      (grouped, anchors)
    }
    val withPatAggs = patAggList.foldLeft(withPatFlags) { (acc, pa) =>
      val name = patAggCol(pa)
      val (grouped, anchors) = patAggFrame(pa, name)
      // anchor-less pattern: a global one-row aggregate, broadcast
      val joined =
        if (anchors.isEmpty) acc.crossJoin(broadcast(grouped))
        else acc.join(grouped, anchors, "left")
      val default =
        if (pa.kind == "count") lit(0L)
        else array().cast(grouped.schema(name).dataType)
      joined.withColumn(name, coalesce(col(name), default))
    }
    // residual WHERE: boolean structure / IS NULL over `binding_prop`
    // columns. When a predicate reads a binding that is NOT returned, the
    // match granularity was widened to carry it — restore the returned
    // granularity afterwards (one dropDuplicates on the returned id
    // columns; their property columns are functionally dependent)
    // resolver shared by residual predicates and expression items: prop ""
    // (a bare reference in a value expression) is the binding's id column
    // keys(b): the node's present (non-null) property keys — computed per
    // row from the joined-back property columns. A property-less node table
    // yields a TYPED empty array (array() alone is array<null> and breaks
    // downstream union/array ops).
    def keysArray(b: String): Column = {
      // node binding → node property columns; relationship binding → the
      // matched edge's property columns (joined back above)
      val propCols = if (edgeByName.contains(b)) edgePropCols else nodePropCols
      if (propCols.isEmpty) array().cast("array<string>")
      else array_compact(array(
        propCols.map(p => when(col(s"${b}_$p").isNotNull, lit(p))): _*))
    }
    def matchResolve(b: String, pr: String): Column =
      if (pr.isEmpty) col(b)
      else if (pr == operators.Preds.KeysProp) keysArray(b)
      else col(s"${b}_$pr")
    val filtered = restResidual.foldLeft(withPatAggs)((acc, p) =>
      acc.filter(operators.Preds.column(p, matchResolve,
        pp => coalesce(col(patFlag(pp)), lit(false)))))
    val withProps =
      if (pg.residual.nonEmpty && (mainNeeded != baseNeeded || edgePropsNeeded.nonEmpty)) {
        val optCols = pg.optional.flatMap(g =>
          pg.referenced.filter(b => g.bindings(b) && !pg.bindings(b))).distinct
        // item-referenced relationships key the dedup by their IDENTITY
        // columns: per-relationship output rows survive (even when two
        // relationships share endpoints or property values), while
        // residual-only relationships still collapse to the returned
        // granularity (existential semantics)
        val relIdCols = (itemEdgeRefs.map(_._1) ++ typeRefNames).distinct
          .flatMap(r => Seq(s"__rel_${r}_s", s"__rel_${r}_d", s"__rel_${r}_t"))
        filtered.dropDuplicates(baseNeeded ++ optCols ++ relIdCols)
      } else filtered
    def valueOf(i: cypher.Ast.Ret): Column = i.expr match {
      // general value expression (arithmetic / CASE / coalesce …): one
      // codegen'd Column over the joined-back property columns
      case Some(e) => operators.Preds.exprColumn(e, matchResolve)
      case None => i.agg match {
        // scalar functions: id(n) is the binding's id column; type(r) is the
        // matched relationship's identity etype column (joined back above);
        // value functions wrap the property (or id) column per-row
        case Some("id")     => col(i.binding)
        case Some("type")   => col(s"__rel_${i.binding}_t")
        // openCypher labels() returns a list; this model is single-label
        case Some("labels") => array(col(s"${i.binding}_label"))
        // the relationship's endpoint ids in STORAGE orientation (openCypher:
        // an undirected match does not reorient the relationship)
        case Some("startnode") => col(s"__rel_${i.binding}_s")
        case Some("endnode")   => col(s"__rel_${i.binding}_d")
        // keys(n): see keysArray (shared with the expression position)
        case Some("keys") => keysArray(i.binding)
        // path functions: the path's node-id list / relationship-type list
        // (identity join-back) / constant hop count. Zero-hop paths emit a
        // TYPED empty array (bare array() is array<null>).
        case Some("nodes") if pg.namedPaths.contains(i.binding) =>
          array(pg.namedPaths(i.binding)._1.map(col): _*)
        case Some("relationships") if pg.namedPaths.contains(i.binding) =>
          val rels = pg.namedPaths(i.binding)._2
          if (rels.isEmpty) array().cast("array<string>")
          else array(rels.map(r => col(s"__rel_${r}_t")): _*)
        case Some("length") if pg.namedPaths.contains(i.binding) =>
          lit(pg.namedPaths(i.binding)._2.size.toLong)
        case Some(f) if operators.Preds.valueFn.contains(f) =>
          operators.Preds.valueFn(f)(
            i.prop.fold(col(i.binding))(p => col(s"${i.binding}_$p")))
        case _ => i.prop.fold(col(i.binding))(p => col(s"${i.binding}_$p"))
      }
    }
    // aggregates run over the distinct matches (set semantics): count(b) =
    // distinct matches per group; sum/min/max/avg fold each distinct match's
    // property once; collect folds each distinct match's value into a
    // SORTED array (deterministic rendering of an unordered collection).
    // All combinable — one map-side-partial groupBy.
    val aggregated =
      if (pg.aggItems.isEmpty)
        withProps.select(pg.groupItems.map(i => valueOf(i).as(i.outName)): _*)
      else {
        val aggs = pg.aggItems.map { i =>
          (i.agg.get match {
            case "count"   => countDistinct(col(i.binding))
            case "sum"     => sum(valueOf(i))
            case "min"     => min(valueOf(i))
            case "max"     => max(valueOf(i))
            case "avg"     => avg(valueOf(i))
            case "collect" => sort_array(collect_list(valueOf(i)))
            case "stdev"   => stddev_samp(valueOf(i))
            case "stdevp"  => stddev_pop(valueOf(i))
            // exact linear-interpolated percentile (openCypher CONT); DISC
            // returns an actual element — percentile_approx at max accuracy
            // is the exact discrete sketch
            case "percentilecont" => percentile(valueOf(i), lit(i.aggParam.get))
            case "percentiledisc" =>
              percentile_approx(valueOf(i), lit(i.aggParam.get), lit(Int.MaxValue))
            case other => throw new cypher.ParseException(
              s"$other() is not supported in this position")
          }).as(i.outName)
        }
        if (pg.groupItems.isEmpty) withProps.agg(aggs.head, aggs.tail: _*)
        else withProps.groupBy(pg.groupItems.map(i => valueOf(i).as(i.outName)): _*)
          .agg(aggs.head, aggs.tail: _*)
      }
    // RETURN DISTINCT dedups the projected VALUES — distinct matches can
    // share a property value (or a type(r) value); id-only returns are
    // already distinct (no-op skipped). Aggregated results are one row per
    // group already.
    val distincted =
      if (pg.distinct && pg.aggItems.isEmpty &&
          pg.items.exists(i => i.prop.isDefined || i.agg.exists(Pattern.ScalarFns) ||
            i.expr.isDefined))
        aggregated.dropDuplicates()
      else aggregated
    // ORDER BY over output columns (beyond the reference — relational surface
    // Spark gives for free; a TakeOrderedAndProject when LIMIT follows, so
    // the sort never materializes globally). SKIP (Cypher's OFFSET) drops
    // rows after the sort, before LIMIT — Spark plans offset+limit together
    // as one global take, so a paged query still never materializes the
    // full sorted result.
    // non-returned sort properties (RETURN b ORDER BY b.name): joined on the
    // output id column purely for the sort — functionally dependent on the
    // returned binding, so granularity is untouched — and dropped after
    val sortJoined = pg.extraSortProps.foldLeft(distincted) { case (acc, (b, p)) =>
      acc.join(graph.nodes.select(col("id").as(b), col(p).as(s"__sort_${b}_$p")),
        Seq(b), "left")
    }
    val ordered =
      if (pg.orderBy.isEmpty) sortJoined
      else sortJoined.orderBy(pg.orderBy.map(k =>
        if (k.asc) col(k.binding).asc else col(k.binding).desc): _*)
    val skipped = pg.skip.fold(ordered)(ordered.offset)
    val limited = pg.limit.fold(skipped)(skipped.limit)
    if (pg.extraSortProps.isEmpty) limited
    else limited.drop(pg.extraSortProps.map { case (b, p) => s"__sort_${b}_$p" }: _*)
  }

  /** Like `query`, but joins each returned binding back to its node row for
    * property columns, prefixed `<binding>_` (reference MatrixTuples +
    * DataStore.getVs render step). Parses once; the binding ids come from
    * the same compiled plan `query` runs. */
  def queryNodes(cypher: String): DataFrame = {
    val pg = Pattern.fromQuery(CypherParser.parse(cypher))
    // key on each plain binding's OUTPUT name, so `RETURN c AS customer`
    // joins (and prefixes properties) as `customer`, matching run()'s columns
    val outs = pg.items.collect {
      case r if r.prop.isEmpty && r.agg.isEmpty && r.expr.isEmpty => r.outName
    }
    outs.foldLeft(run(pg)) { (acc, b) =>
      val props = graph.nodes.columns.filter(_ != "id")
        .map(c => col(c).as(s"${b}_$c"))
      acc.join(graph.nodes.select((col("id").as(b) +: props.toSeq): _*), Seq(b), "left")
    }
  }
}
