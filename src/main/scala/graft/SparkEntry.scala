package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.TpchGraph

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: 2-hop Cypher pattern over the TPC-H-derived property graph. */
  def entry(spark: SparkSession): DataFrame =
    queries("cy_2hop")(spark, "/root/testdata/sf0.001")

  private def db(spark: SparkSession, dir: String): GraphDB =
    new GraphDB(TpchGraph(spark, dir))

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
  )
}
