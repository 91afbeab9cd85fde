package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.FileSourceScanExec

/**
 * Plan-shape regression audit over EVERY SparkEntry query: the properties
 * the 100 TB design depends on, asserted so a refactor that silently
 * reintroduces a scale-killer fails CI instead of only showing up as a
 * bench regression.
 *
 *  - No CartesianProductExec anywhere. The deliberate all-pairs surfaces
 *    (brute-force kNN baseline, broadcast singletons/centroid tables,
 *    block-pair combo joins) all compile to BroadcastNestedLoopJoin or
 *    BroadcastHashJoin with a bounded broadcast side — a shuffle-side
 *    cartesian is always a bug.
 *  - Parquet scans are column-pruned: no scan reads more columns than its
 *    query needs (spot-checked against known-narrow queries).
 */
class PlanAuditSpec extends SparkSpec {

  private def plans(name: String): Seq[SparkPlan] = {
    val root = SparkEntry.queries(name)(spark, SF).queryExecution.executedPlan
    // unwrap AQE roots so collect sees the physical operators
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case other => other +: other.children.flatMap(expand)
    }
    expand(root)
  }

  test("no query plan contains a shuffle-side cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val cart = plans(name).collect { case c: CartesianProductExec => c }
      if (cart.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProductExec in: ${offenders.mkString(", ")}")
  }

  test("pure-projection operators run with zero exchanges (scan-stage only)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // these must stay embarrassingly parallel: any exchange here is a bug
    for (name <- Seq("chunk_docs", "emb_quantize", "text_token_counts",
                     "text_quality", "text_langid", "text_fingerprint", "text_pii_redact")) {
      val shuffles = plans(name).count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 0, s"$name: expected a shuffle-free projection, found $shuffles exchanges")
    }
  }

  test("whole-union ORDER BY + LIMIT plans as one global take, not a full sort") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    assert(plans("cy_union_orderby").exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "trailing ORDER BY/LIMIT over a UNION must compile to TakeOrderedAndProject " +
        "(top-k per partition + driver merge), never a global Sort materialization")
  }

  test("skew join broadcasts the hot-key set and salts via explode") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val ps = plans("skew_join")
    assert(ps.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "hot/cold split must probe a BROADCAST hot-key set, not shuffle for it")
    assert(ps.exists(_.toString.contains("explode")),
      "hot build side must be salted via explode replication")
  }

  test("link predictors broadcast their stats-blind degree tables") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // deg derives from the incidence list (no size stats), so without the
    // explicit hint Spark sort-merges the O(Σ deg²) pair table against a
    // vertex-sized table — measured 1.5-2.5x of each query's runtime
    for (name <- Seq("adamic_adar", "neighbor_jaccard")) {
      assert(plans(name).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"$name: degree join must broadcast, not shuffle the pair table")
    }
  }

  test("hub-salted wedge path: block combos broadcast, no cartesian, keys salted") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // force every common-neighbor key through the hot path; disable
    // auto-broadcast so the hot self-join's exchange (invisible at toy
    // scale, where AQE would broadcast the whole side) stays in the plan —
    // the HINTED broadcasts (combos, deg) are unaffected
    val es = ((1L to 8L).map(i => (0L, i)) ++ Seq((1L, 2L), (5L, 6L))).toDF("src", "dst")
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        expand(a.executedPlan)
      case other => other +: other.children.flatMap(expand)
    }
    // the conf is read at PLANNING time, so the whole plan build stays
    // inside the conf window
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val ps =
      try expand(graft.algorithms.Algorithms.adamicAdar(es, hubDeg = 1L, blocks = 4)
        .queryExecution.executedPlan)
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!ps.exists(_.isInstanceOf[CartesianProductExec]),
      "block decomposition must never compile to a shuffle-side cartesian")
    assert(ps.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the combo table and degree table must ride broadcast joins")
    // the hot self-join's shuffle keys must include the block column, so a
    // hub key's pairs spread across `blocks` partitions instead of one
    val shuffleKeys = ps.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.toString
    }
    assert(shuffleKeys.exists(k => k.contains("rby") || k.contains("cby")),
      s"hot-path shuffle must partition by (w, block), got: ${shuffleKeys.mkString(" | ")}")
  }

  test("round-4 ops: encode broadcasts its vocab, quota/retention stay single-shuffle-per-stage") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.SortExec
    // text_encode: the token stream must meet the vocab via BROADCAST (the
    // stream never shuffles on tok), and the vocab top-k must be a
    // TakeOrdered, never a global sort of the frequency table
    val enc = plans("text_encode")
    assert(enc.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "vocab must broadcast onto the token stream")
    assert(!enc.exists(p => p.isInstanceOf[SortExec] &&
        p.asInstanceOf[SortExec].global &&
        !p.toString.contains("pos")),  // the per-doc window sort is local to doc partitions
      s"vocab top-k must be TakeOrdered, found a global sort")
    assert(enc.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "vocab selection must compile to TakeOrderedAndProject (distributed partial top-k)")
    // sample_quota: one window shuffle on the group key; the rank filter
    // must not introduce extra exchanges beyond the score join's
    val quota = plans("sample_quota")
    assert(quota.count(_.isInstanceOf[ShuffleExchangeExec]) <= 2,
      "quota: expected at most score-join + window exchanges")
    // ev_retention: cohort sizes must broadcast onto the activity rollup
    assert(plans("ev_retention").exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "retention: cohort-size table must broadcast")
  }

  test("parquet scans are column-pruned to what the query reads") {
    def scanWidths(name: String): Seq[Int] =
      plans(name).collect { case s: FileSourceScanExec => s.requiredSchema.size }
    // q1_agg needs 5 of lineitem's 16 columns
    assert(scanWidths("q1_agg").forall(_ <= 5))
    // window_topk needs 3 of orders' 9 columns
    assert(scanWidths("window_topk").forall(_ <= 3))
    // token counting needs (doc_id, text) of documents' 5 columns
    assert(scanWidths("text_token_counts").forall(_ <= 2))
    // mxm_minplus needs 4 of lineitem's 16 columns
    assert(scanWidths("mxm_minplus").forall(_ <= 4))
  }

  test("expression queries stay inside whole-stage codegen, no UDF nodes") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // the expression engine compiles to built-in Catalyst columns — CASE,
    // coalesce, arithmetic, string/list functions must all sit inside a
    // WholeStageCodegen span and never fall back to an eval/UDF node.
    // AQE wraps codegen per stage only as stages MATERIALIZE, so execute
    // first and inspect the finalized plan.
    for (name <- Seq("cy_expr_arith", "cy_expr_case", "cy_expr_coalesce",
                     "cy_expr_agg", "cy_fn_substr", "cy_list_fns")) {
      val df = SparkEntry.queries(name)(spark, SF)
      df.collect()
      // materialized AQE plans nest per-stage subtrees in QueryStageExec
      // LEAF nodes — unwrap those too
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: expand(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: expand(q.plan)
        case other => other +: other.children.flatMap(expand)
      }
      val ps = expand(df.queryExecution.executedPlan)
      assert(ps.exists(_.isInstanceOf[WholeStageCodegenExec]),
        s"$name: expected a WholeStageCodegen span")
      assert(!ps.exists(_.getClass.getName.toLowerCase.contains("python")),
        s"$name: unexpected UDF/eval node")
    }
  }

  test("round-8 plan shapes: weighted sample is a pure filter, range is distributed, " +
       "sketch is one partial-agg shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // per-row weighted sampling must stay embarrassingly parallel — the
    // md5 draw and the threshold are both per-row projections
    assert(plans("sample_weighted").count(_.isInstanceOf[ShuffleExchangeExec]) == 0,
      "sample_weighted: expected a shuffle-free filter")
    // UNWIND range() must read from the DISTRIBUTED Range source, never a
    // driver-materialized local relation
    val rangePlans = plans("cy_unwind_range")
    assert(rangePlans.exists(_.isInstanceOf[org.apache.spark.sql.execution.RangeExec]),
      "cy_unwind_range: expected a RangeExec source")
    assert(!rangePlans.exists(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      "cy_unwind_range: range() must not materialize a driver-side list")
    // the KMV sketch aggregates with map-side partials: exactly one
    // exchange between partial and final (plus none elsewhere — the hash
    // projection is per-row); the bounded Aggregator buffer is the point
    val sk = plans("sketch_distinct")
    assert(sk.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "sketch_distinct: expected exactly the partial->final aggregate exchange")
    assert(sk.exists(_.getClass.getSimpleName.contains("ObjectHashAggregate")),
      "sketch_distinct: expected ObjectHashAggregate (typed Aggregator partial combine)")
  }

  test("round-9 plan shapes: span dedup is index-shaped, write surface joins bounded") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, BroadcastHashJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.execution.window.WindowExec
    // duplicateSpans must be inverted-index shaped: gram frequency groupBy
    // + ONE semi-join marking positions + a per-doc window merge. A
    // gram-on-gram self-join (d² rows per hot gram) would show as an inner
    // join here and be a 100 TB scale-killer.
    val sp = plans("dedup_spans")
    val joinTypes = sp.collect {
      case j: SortMergeJoinExec => j.joinType.toString
      case j: BroadcastHashJoinExec => j.joinType.toString
      case j: ShuffledHashJoinExec => j.joinType.toString
    }
    assert(joinTypes.nonEmpty && joinTypes.forall(_.contains("LeftSemi")),
      s"dedup_spans: only the position-mark semi-join is allowed, found $joinTypes")
    assert(sp.exists(_.isInstanceOf[WindowExec]),
      "dedup_spans: expected the per-doc gaps-and-islands window")
    assert(sp.count(_.isInstanceOf[ShuffleExchangeExec]) <= 4,
      "dedup_spans: gram agg + semi probe + doc window should bound the exchanges")
    // the SET rewrite is one outer join of the node table against the
    // matched ids — no exchange storm, no cartesian (global audit covers
    // the latter); the match side is tiny and broadcasts
    val st = plans("cy_set")
    assert(st.count(_.isInstanceOf[ShuffleExchangeExec]) <= 6,
      "cy_set: the match + one id join must not multiply exchanges")
  }

  test("round-11 plan shapes: streaming-HLL registers one shuffle, varlen union bounded") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    // the register maintenance must be ONE partially-aggregated groupBy:
    // a single exchange between partial and final max(r) — that is the
    // whole 100 TB claim (map-side state collapse before any shuffle).
    // stream_hll chains the read-side estimate, adding its own agg pair.
    val sh = plans("stream_hll")
    assert(sh.count(_.isInstanceOf[ShuffleExchangeExec]) <= 2,
      "stream_hll: register max + estimate sum must be two agg pairs at most")
    val aggs = sh.count(p =>
      p.isInstanceOf[HashAggregateExec] || p.isInstanceOf[ObjectHashAggregateExec])
    assert(aggs >= 2 && aggs <= 6, s"stream_hll: expected partial+final agg pairs, got $aggs")
    // varlen named path: hi-lo+1 fixed-length branches union — the plan
    // size grows with the BOUND (2 branches here), never the data, and the
    // per-branch joins stay broadcast/hash (no cartesian — global audit)
    val vp = plans("cy_path_varlen")
    import org.apache.spark.sql.execution.UnionExec
    assert(vp.exists(_.isInstanceOf[UnionExec]), "cy_path_varlen: expected the branch union")
    assert(vp.count(_.isInstanceOf[ShuffleExchangeExec]) <= 8,
      "cy_path_varlen: two fixed-length branches must stay exchange-bounded")
  }

  test("round-11b plan shapes: range join equi-only, heavy hitters broadcast-verified, " +
       "shard shuffle single-exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // ev_range_join: the binned decomposition must plan as an EQUI-join on
    // (key, bin) — a nested-loop join on the data path is exactly the
    // per-key theta cross product the operator exists to avoid
    val rj = plans("ev_range_join")
    assert(rj.exists(p => p.isInstanceOf[SortMergeJoinExec] ||
        p.isInstanceOf[ShuffledHashJoinExec] || p.isInstanceOf[BroadcastHashJoinExec]),
      "ev_range_join: expected an equi-join on (key, bin)")
    assert(!rj.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "ev_range_join: a theta/nested-loop join leaked into the plan")
    // sketch_topk: the only shuffles are the O(s)-sized aggregate
    // exchanges (two single-partition summary aggs + the ≤ s-key verify
    // groupBy); candidates and N return to the stream as broadcasts
    val hh = plans("sketch_topk")
    assert(hh.count(_.isInstanceOf[ShuffleExchangeExec]) <= 3,
      "sketch_topk: expected at most the two summary aggs + bounded verify groupBy")
    assert(hh.count(p => p.isInstanceOf[BroadcastHashJoinExec] ||
        p.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 2,
      "sketch_topk: candidate keys and N must come back as broadcasts")
    // shard_assign: exactly ONE exchange — the hash-by-shard partition for
    // the in-shard position window; a global sort (range exchange /
    // ordered take) anywhere means the no-global-sort claim broke
    val sa = plans("shard_assign")
    assert(sa.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "shard_assign: expected exactly the hash-by-shard exchange")
    assert(!sa.exists(p => p.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]
        || p.isInstanceOf[org.apache.spark.sql.execution.GlobalLimitExec]),
      "shard_assign: no global take/limit belongs in the shard window plan")
  }

  test("round-11c plan shapes: covariance single-shuffle, bloom probe unshuffled, " +
       "scd2 one key exchange, pattern-size joins back broadcast-sized") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // emb_covariance: the corpus pass is a single fold-in-place
    // mapPartitions job at construction (r12 rewrite — no product-row
    // explode, no agg shuffle); the RESULT is a dim²-row local relation,
    // so its plan must be exchange-free and local
    val cov = plans("emb_covariance")
    assert(cov.count(_.isInstanceOf[ShuffleExchangeExec]) == 0,
      "emb_covariance: the dim²-row result must be a local relation, not a shuffled plan")
    // scd2_history: ONE hash exchange on the key feeds both window passes
    // (same partitioning, no re-shuffle between detect and number)
    val scd = plans("scd2_history")
    assert(scd.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "scd2_history: both window passes must ride one key exchange")
    // stream_topk batch path: count table agg + the one-row-per-window
    // totals agg; the threshold join comes back as a broadcast
    val st = plans("stream_topk")
    assert(st.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 1,
      "stream_topk: the per-window totals must broadcast, not shuffle-join")
  }

  test("round-11d plan shapes: IVFADC prunes via broadcasts, sliding window one exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // knn_ivfpq: the query path touches the code table once, pre-filtered
    // by a BROADCAST probe join and scored through a BROADCAST distance
    // table — a shuffled join against either would move the corpus for a
    // bounded-query lookup
    val ivf = plans("knn_ivfpq")
    assert(ivf.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      "knn_ivfpq: probe set and ADC distance table must join as broadcasts")
    // stream_sliding: window replication is a projection (explode of the 4
    // window structs), so the whole query is ONE agg exchange
    val sl = plans("stream_sliding")
    assert(sl.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "stream_sliding: expected exactly the one aggregate exchange")
  }

  test("round-11e plan shapes: all-kNN bucket join moves ids only; ewma one exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    // knn_join (corpus-vs-corpus): the candidate-pair exchanges (bucket
    // join + distinct) must NOT carry embedding arrays — only the two
    // ~corpus-sized scoring join-backs may shuffle a vector column. More
    // array-carrying exchanges = the pre-fix shape (3-8x wall, measured).
    val kj = plans("knn_join")
    val arrayExchanges = kj.collect {
      case e: ShuffleExchangeExec
        if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
    }
    assert(arrayExchanges.size <= 2,
      s"knn_join: candidate pairs must shuffle ids only, got ${arrayExchanges.size} " +
        "array-carrying exchanges")
    // ev_ewma: 8 lags in ONE window pass = one exchange
    val ew = plans("ev_ewma")
    assert(ew.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "ev_ewma: all lag terms must evaluate in a single window exchange")
  }
}
