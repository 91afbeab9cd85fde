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
}
