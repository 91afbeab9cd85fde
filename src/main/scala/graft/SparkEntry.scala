package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.TpchGraph
import graft.kernel._
import graft.algorithms.Algorithms

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: 2-hop Cypher pattern over the TPC-H-derived property graph. */
  def entry(spark: SparkSession): DataFrame =
    queries("cy_2hop")(spark, "/root/testdata/sf0.001")

  private def db(spark: SparkSession, dir: String): GraphDB =
    new GraphDB(TpchGraph(spark, dir))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Cypher pattern matching (reference's core surface) ---
    "cy_expand_1hop" -> ((s, dir) =>
      db(s, dir).query("MATCH (c:customer)-[:IN_NATION]->(n:nation) RETURN n")),
    "cy_2hop" -> ((s, dir) =>
      db(s, dir).query("MATCH (c:customer)-[:IN_NATION]->(n:nation)-[:IN_REGION]->(r:region) RETURN c, r")),
    "cy_incoming" -> ((s, dir) =>
      db(s, dir).query("MATCH (n:nation)<-[:IN_NATION]-(s:supplier) RETURN n")),
    "cy_fork_middle" -> ((s, dir) =>
      db(s, dir).query("MATCH (c:customer)-[:IN_NATION]->(n:nation)<-[:IN_NATION]-(su:supplier) RETURN n")),
    "cy_multi_return" -> ((s, dir) =>
      db(s, dir).query("MATCH (su:supplier)-[:SUPPLIES]->(p:part)<-[:CONTAINS]-(o:order) RETURN su, o")),

    // --- kernel: semiring matrix algebra (SURVEY §2.3) ---
    // Boolean mxm over ANY_PAIR: (customer|supplier)→nation · nation→region
    "mxm_anypair" -> ((s, dir) => {
      val g = TpchGraph(s, dir)
      val a = GrMatrix(g.edgesByType(Seq("IN_NATION")).select(col("src").as("i"), col("dst").as("j"), lit(true).as("v")))
      val b = GrMatrix(g.edgesByType(Seq("IN_REGION")).select(col("src").as("i"), col("dst").as("j"), lit(true).as("v")))
      GrOps.mxm(Ops.anyPair)(a, b).df.select("i", "j")
    }),
    // weighted mxm over (min, plus): order→part min-qty · part→supplier min-qty
    "mxm_minplus" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = GrMatrix(li.groupBy(col("l_orderkey").as("i"), col("l_partkey").as("j"))
        .agg(min("l_quantity").as("v")))
      val b = GrMatrix(li.groupBy(col("l_partkey").as("i"), col("l_suppkey").as("j"))
        .agg(min("l_quantity").as("v")))
      GrOps.mxm(Ops.minPlus)(a, b).df
    }),
    // eWiseAdd (plus) of click-counts and purchase-counts per (user, day)
    "ewise_union" -> ((s, dir) => {
      val ev = graft.sources.Tables.events(s, dir)
      def m(tp: String) = GrMatrix(ev.filter(col("event_type") === tp)
        .groupBy(col("user_id").as("i"), datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("j"))
        .agg(count(lit(1)).as("v")))
      GrOps.eWiseAdd(Ops.plus)(m("click"), m("purchase")).df
    }),
    "ewise_intersect" -> ((s, dir) => {
      val ev = graft.sources.Tables.events(s, dir)
      def m(tp: String) = GrMatrix(ev.filter(col("event_type") === tp)
        .groupBy(col("user_id").as("i"), datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("j"))
        .agg(count(lit(1)).as("v")))
      GrOps.eWiseMult(Ops.plus)(m("click"), m("purchase")).df
    }),
    // per-row reduction: CONTAINS out-degree per order (distinct parts)
    "reduce_rows" -> ((s, dir) => {
      val g = TpchGraph(s, dir)
      val m = GrMatrix(g.edgesByType(Seq("CONTAINS")).select(col("src").as("i"), col("dst").as("j"), lit(1L).as("v")))
      GrOps.reduceRows(Ops.plusM)(m).df
    }),

    // --- algorithms (SURVEY §2.6) ---
    "bfs_levels" -> ((s, dir) => {
      val g = TpchGraph(s, dir)
      Algorithms.bfs(
        g.edgesByType(Seq("IN_NATION", "IN_REGION")).select("src", "dst"),
        g.nodesByLabel("customer").select("id"))
    }),
    "sssp_minplus" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sp = li.groupBy((col("l_suppkey") + TpchGraph.SupplierOff).as("src"),
        (col("l_partkey") + TpchGraph.PartOff).as("dst")).agg(min("l_quantity").as("w"))
      val po = li.groupBy((col("l_partkey") + TpchGraph.PartOff).as("src"),
        (col("l_orderkey") + TpchGraph.OrderOff).as("dst")).agg(min("l_quantity").as("w"))
      val suppliers = t(s, dir, "supplier")
        .select((col("s_suppkey") + TpchGraph.SupplierOff).as("id"))
      Algorithms.sssp(sp.unionByName(po), suppliers)
    }),
    "wcc" -> ((s, dir) => {
      val g = TpchGraph(s, dir)
      val vs = g.nodes.filter(col("label").isin("nation", "region")).select("id")
      Algorithms.connectedComponents(vs, g.edgesByType(Seq("IN_REGION")))
    }),
    "pagerank" -> ((s, dir) => {
      val g = TpchGraph(s, dir)
      val vs = g.nodes.filter(col("label").isin("nation", "region")).select("id")
      Algorithms.pageRank(vs, g.edgesByType(Seq("IN_REGION")), iters = 10)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "cy_expand_1hop" ->
      "SELECT DISTINCT c_nationkey + 2000000000 AS n FROM customer",
    "cy_2hop" ->
      ("SELECT DISTINCT c_custkey + 3000000000 AS c, n_regionkey + 1000000000 AS r " +
       "FROM customer JOIN nation ON c_nationkey = n_nationkey"),
    "cy_incoming" ->
      "SELECT DISTINCT s_nationkey + 2000000000 AS n FROM supplier",
    "cy_fork_middle" ->
      ("SELECT DISTINCT c_nationkey + 2000000000 AS n FROM customer " +
       "WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)"),
    "cy_multi_return" ->
      ("SELECT DISTINCT l1.l_suppkey + 4000000000 AS su, l2.l_orderkey + 6000000000 AS o " +
       "FROM lineitem l1 JOIN lineitem l2 ON l1.l_partkey = l2.l_partkey"),

    "mxm_anypair" ->
      ("SELECT DISTINCT c_custkey + 3000000000 AS i, n_regionkey + 1000000000 AS j " +
       "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
       "UNION SELECT DISTINCT s_suppkey + 4000000000, n_regionkey + 1000000000 " +
       "FROM supplier JOIN nation ON s_nationkey = n_nationkey"),
    "mxm_minplus" ->
      ("WITH a AS (SELECT l_orderkey AS i, l_partkey AS j, min(l_quantity) AS v FROM lineitem GROUP BY 1,2), " +
       "b AS (SELECT l_partkey AS i, l_suppkey AS j, min(l_quantity) AS v FROM lineitem GROUP BY 1,2) " +
       "SELECT a.i AS i, b.j AS j, min(a.v + b.v) AS v FROM a JOIN b ON a.j = b.i GROUP BY 1,2"),
    "ewise_union" ->
      ("WITH c AS (SELECT user_id AS i, date_diff('day', DATE '2024-01-01', ts::date) AS j, count(*) AS v " +
       "FROM events WHERE event_type='click' GROUP BY 1,2), " +
       "p AS (SELECT user_id AS i, date_diff('day', DATE '2024-01-01', ts::date) AS j, count(*) AS v " +
       "FROM events WHERE event_type='purchase' GROUP BY 1,2) " +
       "SELECT coalesce(c.i, p.i) AS i, coalesce(c.j, p.j) AS j, " +
       "coalesce(c.v, 0) + coalesce(p.v, 0) AS v FROM c FULL OUTER JOIN p ON c.i = p.i AND c.j = p.j"),
    "ewise_intersect" ->
      ("WITH c AS (SELECT user_id AS i, date_diff('day', DATE '2024-01-01', ts::date) AS j, count(*) AS v " +
       "FROM events WHERE event_type='click' GROUP BY 1,2), " +
       "p AS (SELECT user_id AS i, date_diff('day', DATE '2024-01-01', ts::date) AS j, count(*) AS v " +
       "FROM events WHERE event_type='purchase' GROUP BY 1,2) " +
       "SELECT c.i AS i, c.j AS j, c.v + p.v AS v FROM c JOIN p ON c.i = p.i AND c.j = p.j"),
    "reduce_rows" ->
      ("SELECT l_orderkey + 6000000000 AS i, count(DISTINCT l_partkey) AS v " +
       "FROM lineitem GROUP BY 1"),

    "bfs_levels" ->
      ("SELECT c_custkey + 3000000000 AS id, 0 AS level FROM customer " +
       "UNION SELECT DISTINCT c_nationkey + 2000000000, 1 FROM customer " +
       "UNION SELECT DISTINCT n_regionkey + 1000000000, 2 FROM customer " +
       "JOIN nation ON c_nationkey = n_nationkey"),
    "sssp_minplus" ->
      ("WITH sp AS (SELECT l_suppkey AS s, l_partkey AS p, min(l_quantity) AS w FROM lineitem GROUP BY 1,2), " +
       "po AS (SELECT l_partkey AS p, l_orderkey AS o, min(l_quantity) AS w FROM lineitem GROUP BY 1,2), " +
       "dp AS (SELECT p, min(w) AS d FROM sp GROUP BY 1), " +
       "dord AS (SELECT po.o, min(dp.d + po.w) AS d FROM dp JOIN po ON dp.p = po.p GROUP BY 1) " +
       "SELECT s_suppkey + 4000000000 AS id, 0.0 AS dist FROM supplier " +
       "UNION ALL SELECT p + 5000000000, d FROM dp " +
       "UNION ALL SELECT o + 6000000000, d FROM dord"),
    "wcc" ->
      ("SELECT n_nationkey + 2000000000 AS id, n_regionkey + 1000000000 AS component FROM nation " +
       "UNION ALL SELECT r_regionkey + 1000000000, r_regionkey + 1000000000 FROM region"),
    // pagerank: no SQL oracle (iterative) → driver rows-only check
  )
}
