package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/**
 * Derives a property graph from the driver's TPC-H-ish parquet tables
 * (TESTDATA.md) so graph queries have a DuckDB-expressible oracle.
 *
 * Node id space: each label gets a disjoint BIGINT range via a per-label
 * offset (billions apart — TPC-H keys are dense from 0). These offsets are
 * part of the public contract: oracle SQL reproduces them as literal
 * additions.
 *
 *   region   id = r_regionkey + 1e9      label "region"
 *   nation   id = n_nationkey + 2e9      label "nation"
 *   customer id = c_custkey   + 3e9      label "customer"
 *   supplier id = s_suppkey   + 4e9      label "supplier"
 *   part     id = p_partkey   + 5e9      label "part"
 *   order    id = o_orderkey  + 6e9      label "order"
 *
 * Edges:
 *   nation   -[IN_REGION]-> region
 *   customer -[IN_NATION]-> nation
 *   supplier -[IN_NATION]-> nation
 *   customer -[PLACED]->    order
 *   order    -[CONTAINS]->  part       (from lineitem, deduped)
 *   supplier -[SUPPLIES]->  part       (from lineitem, deduped)
 *
 * Node property columns: name STRING (entity name or null), value DOUBLE
 * (acctbal / retailprice / totalprice as applicable).
 * Edge property column: weight DOUBLE (PLACED = o_totalprice; CONTAINS /
 * SUPPLIES = min l_quantity over the deduped lineitem rows; else null).
 */
object TpchGraph {
  val RegionOff   = 1000000000L
  val NationOff   = 2000000000L
  val CustomerOff = 3000000000L
  val SupplierOff = 4000000000L
  val PartOff     = 5000000000L
  val OrderOff    = 6000000000L

  def apply(spark: SparkSession, dir: String): PropertyGraph = {
    def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
    val region = t("region"); val nation = t("nation")
    val customer = t("customer"); val supplier = t("supplier")
    val part = t("part"); val orders = t("orders"); val lineitem = t("lineitem")

    def nodes(df: DataFrame, key: String, off: Long, label: String,
              name: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column): DataFrame =
      df.select(
        (col(key).cast("long") + lit(off)).as("id"),
        lit(label).as("label"),
        name.cast("string").as("name"),
        value.cast("double").as("value"))

    val nullS = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    val allNodes =
      nodes(region, "r_regionkey", RegionOff, "region", col("r_name"), nullD)
        .unionByName(nodes(nation, "n_nationkey", NationOff, "nation", col("n_name"), nullD))
        .unionByName(nodes(customer, "c_custkey", CustomerOff, "customer", col("c_name"), col("c_acctbal")))
        .unionByName(nodes(supplier, "s_suppkey", SupplierOff, "supplier", col("s_name"), col("s_acctbal")))
        .unionByName(nodes(part, "p_partkey", PartOff, "part", col("p_name"), col("p_retailprice")))
        .unionByName(nodes(orders, "o_orderkey", OrderOff, "order", nullS, col("o_totalprice")))

    // Edge property `weight DOUBLE`: o_totalprice on PLACED; for the
    // lineitem-derived types the dedup is a groupBy so the surviving edge
    // carries min(l_quantity) — same shuffle the dropDuplicates paid, and it
    // gives WHERE r.weight predicates a DuckDB-expressible oracle
    // (HAVING min(l_quantity) ...)
    val nullW = lit(null).cast("double").as("weight")
    val allEdges =
      nation.select((col("n_nationkey").cast("long") + NationOff).as("src"),
        (col("n_regionkey").cast("long") + RegionOff).as("dst"), lit("IN_REGION").as("etype"), nullW)
      .unionByName(customer.select((col("c_custkey") + CustomerOff).as("src"),
        (col("c_nationkey").cast("long") + NationOff).as("dst"), lit("IN_NATION").as("etype"), nullW))
      .unionByName(supplier.select((col("s_suppkey") + SupplierOff).as("src"),
        (col("s_nationkey").cast("long") + NationOff).as("dst"), lit("IN_NATION").as("etype"), nullW))
      .unionByName(orders.select((col("o_custkey") + CustomerOff).as("src"),
        (col("o_orderkey") + OrderOff).as("dst"), lit("PLACED").as("etype"),
        col("o_totalprice").cast("double").as("weight")))
      .unionByName(lineitem
        .groupBy((col("l_orderkey") + OrderOff).as("src"), (col("l_partkey") + PartOff).as("dst"))
        .agg(min(col("l_quantity")).cast("double").as("weight"))
        .select(col("src"), col("dst"), lit("CONTAINS").as("etype"), col("weight")))
      .unionByName(lineitem
        .groupBy((col("l_suppkey") + SupplierOff).as("src"), (col("l_partkey") + PartOff).as("dst"))
        .agg(min(col("l_quantity")).cast("double").as("weight"))
        .select(col("src"), col("dst"), lit("SUPPLIES").as("etype"), col("weight")))

    // every edge type is unique on (src, dst) by construction (FK projections
    // + explicit dropDuplicates for the lineitem-derived types)
    PropertyGraph(allNodes, allEdges, edgesDistinct = true)
  }
}
