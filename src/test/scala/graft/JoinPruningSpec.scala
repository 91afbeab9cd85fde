package graft

import graft.operators.JoinPruning
import org.apache.spark.sql.functions._

/** Bloom-pruned join contract: result ≡ plain inner join (no false
  * negatives), and the pruning stage is k BROADCAST left-semi joins — the
  * probe side never shuffles before the exact join. */
class JoinPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$SF/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey", "o_custkey")
  private lazy val li = spark.read.parquet(s"$SF/lineitem.parquet")
    .select("l_orderkey", "l_extendedprice")

  test("bloom-pruned join equals plain inner join, duplicates included") {
    val pruned = JoinPruning.bloomPrunedJoin(orders, li, "o_orderkey", "l_orderkey",
      k = 4, mBits = 1024)
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
    assert(pruned.columns.sorted.sameElements(plain.columns.sorted))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("tiny filter (high FP rate) still loses no matches") {
    val pruned = JoinPruning.bloomPrunedJoin(orders, li, "o_orderkey", "l_orderkey",
      k = 2, mBits = 16) // nearly saturated bits → prunes little, misses nothing
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("empty build side prunes everything") {
    val none = orders.filter(lit(false))
    assert(JoinPruning.bloomPrunedJoin(none, li, "o_orderkey", "l_orderkey",
      k = 3, mBits = 64).isEmpty)
  }

  test("null probe keys are dropped by pruning (matches inner-join semantics)") {
    val probe = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("pk")
    val build = Seq(1L, 2L).toDF("bk")
    val got = JoinPruning.bloomPrunedJoin(build, probe, "bk", "pk", k = 3, mBits = 256)
      .select("pk").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 2L)))
  }

  test("same-named keys: joined output keeps ONE key column, usable by name downstream") {
    // the common equi-join spelling — both sides call the key "k"; the
    // result must expose a single "k" so groupBy/select by name resolve
    val probe = Seq((1L, "a"), (2L, "b"), (2L, "c"), (9L, "x")).toDF("k", "pv")
    val build = Seq((1L, 10), (2L, 20)).toDF("k", "bv")
    val joined = JoinPruning.bloomPrunedJoin(build, probe, "k", "k", k = 3, mBits = 256)
    assert(joined.columns.count(_ == "k") == 1, joined.columns.mkString(","))
    val agg = joined.groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(agg == Map(1L -> 1L, 2L -> 2L))
  }

  test("plan: pruning is k broadcast left-semi joins before the exact join") {
    val pruned = JoinPruning.bloomPruneRows(li, col("l_orderkey"),
      graft.sketch.Sketches.bloomBits(orders, col("o_orderkey"), 4, 1024), 4, 1024)
    val plan = pruned.queryExecution.executedPlan.toString
    val semis = "BroadcastHashJoin .*LeftSemi".r.findAllIn(plan).size
    assert(semis == 4, s"expected 4 broadcast semi joins, got $semis in:\n$plan")
    // the probe side reaches the semi joins scan-direct: no exchange that
    // hashes on the probe key before/among the semi joins
    assert(!"Exchange hashpartitioning\\(l_orderkey".r.findFirstIn(plan).isDefined, plan)
  }
}
