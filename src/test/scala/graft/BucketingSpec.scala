package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed tables must make same-key joins and aggregations exchange-free —
  * the on-disk co-location contract the 100 TB layout depends on. */
class BucketingSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case other => other +: other.children.flatMap(expand)
    }
    expand(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed equi-join and aggregation run with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketing").toString
    val edges = spark.read.parquet(s"$SF/lineitem.parquet")
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
    val parts = spark.read.parquet(s"$SF/part.parquet")
      .select(col("p_partkey").as("dst"), col("p_retailprice"))
    Bucketing.writeBucketed(edges, "b_edges", s"$dir/b_edges", 4, Seq("dst"))
    Bucketing.writeBucketed(parts, "b_parts", s"$dir/b_parts", 4, Seq("dst"))
    val be = Bucketing.readBucketed(spark, "b_edges")
    val bp = Bucketing.readBucketed(spark, "b_parts")

    // co-located join: same key, same bucket count → no exchange either side
    val joined = be.join(bp, "dst")
    assert(shuffles(joined) == 0, "bucketed join should not shuffle")
    // bucket-key aggregation: clustering satisfied by the on-disk layout
    val agg = be.groupBy("dst").count()
    assert(shuffles(agg) == 0, "bucket-key aggregation should not shuffle")
    // and the data is intact
    assert(joined.count() == edges.join(parts, "dst").count())

    // control: the same join over plain parquet DOES shuffle (guards against
    // the assertion passing vacuously, e.g. via a broadcast join)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = edges.join(parts, "dst")
      assert(shuffles(plain) > 0, "control: unbucketed join should shuffle")
      val bucketedStill = be.join(bp, "dst")
      assert(shuffles(bucketedStill) == 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    spark.sql("DROP TABLE IF EXISTS b_edges")
    spark.sql("DROP TABLE IF EXISTS b_parts")
  }

  test("bucketed graph store: same results, fewer exchanges, dst copy correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gstore").toString
    val plain = graft.sources.TpchGraph(spark, SF)
    graft.sources.GraphStore.saveBucketed(plain, "gb", dir, 4)
    val bucketed = graft.sources.GraphStore.loadBucketed(spark, "gb", edgesDistinct = true)
    val q2hop = "MATCH (c:customer)-[:IN_NATION]->(n:nation)-[:IN_REGION]->(r:region) RETURN c, r"
    val qIn = "MATCH (n:nation)<-[:IN_NATION]-(c:customer) RETURN n, c"
    // force SMJ so exchange elision is observable (broadcast would hide it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pdb = new GraphDB(plain)
      val bdb = new GraphDB(bucketed)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows(bdb.query(q2hop)) == rows(pdb.query(q2hop)))
      // the bucketed layout removes at least the edge-scan exchanges
      val (pSh, bSh) = (shuffles(pdb.query(q2hop)), shuffles(bdb.query(q2hop)))
      assert(bSh < pSh, s"bucketed plan should shuffle less: plain $pSh, bucketed $bSh")
      // incoming traversal reads the dst-bucketed copy — identical rows
      assert(rows(bdb.query(qIn)) == rows(pdb.query(qIn)))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("gb_nodes", "gb_edges", "gb_edges_rev")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
