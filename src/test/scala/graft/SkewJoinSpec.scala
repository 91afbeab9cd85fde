package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** SkewJoin's contract: salted result ≡ plain inner join, row for row
  * (duplicate multiplicities included), whichever path rows take. */
class SkewJoinSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$SF/lineitem.parquet")
    .select(col("l_suppkey"), col("l_partkey"), col("l_quantity"))
  private lazy val sup = spark.read.parquet(s"$SF/supplier.parquet")
    .select(col("s_suppkey"), col("s_nationkey"))
  private lazy val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))

  private def assertSameBag(a: org.apache.spark.sql.DataFrame,
                            b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.sorted.sameElements(b.columns.sorted))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("hot path: low threshold makes every key hot; result equals plain join") {
    val salted = SkewJoin.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
      salts = 4, hotThreshold = 1)
    assertSameBag(salted, plain)
  }

  test("cold path: unreachable threshold keeps every key cold; result equals plain join") {
    val salted = SkewJoin.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
      salts = 4, hotThreshold = Long.MaxValue)
    assertSameBag(salted, plain)
  }

  test("mixed hot/cold split at the median key frequency equals plain join") {
    val freqs = li.groupBy("l_suppkey").count().select("count")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted
    val median = freqs(freqs.length / 2)
    val salted = SkewJoin.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
      salts = 4, hotThreshold = median)
    assertSameBag(salted, plain)
  }

  test("duplicate build keys multiply rows exactly like a plain join") {
    import spark.implicits._
    val probe = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "pv")
    val build = Seq((1, "x"), (1, "y"), (3, "z")).toDF("j", "bv")
    val salted = SkewJoin.saltedJoin(probe, build, "k", "j",
      salts = 3, hotThreshold = 2)
    val plainSmall = probe.join(build, col("k") === col("j"))
    assertSameBag(salted, plainSmall) // key 1 is hot: 2 probe × 2 build = 4 rows
    assert(salted.count() == 4)
  }

  test("a salt fan-out of 1 degenerates to the plain join") {
    val salted = SkewJoin.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
      salts = 1, hotThreshold = 1)
    assertSameBag(salted, plain)
  }

  test("same-named keys work on BOTH paths and keep one key column") {
    import spark.implicits._
    val probe = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "pv")
    val build = Seq((1L, 10), (2L, 20)).toDF("k", "bv")
    val salted = SkewJoin.saltedJoin(probe, build, "k", "k",
      salts = 3, hotThreshold = 3) // key 1 hot, key 2 cold — both paths hit
    assert(salted.columns.count(_ == "k") == 1, salted.columns.mkString(","))
    val agg = salted.groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(agg == Map(1L -> 3L, 2L -> 1L))
  }

  test("identical hot probe rows still spread across salts (no straggler)") {
    import spark.implicits._
    // 40 IDENTICAL rows of one hot key: a content-only salt put them all
    // on one shuffle partition — the monotonic-id mix must spread them
    val probe = Seq.fill(40)((1L, "same")).toDF("k", "pv").repartition(4)
    val build = Seq((1L, 10)).toDF("j", "bv")
    val salted = SkewJoin.saltedJoin(probe, build, "k", "j",
      salts = 4, hotThreshold = 2)
    assert(salted.count() == 40L) // result contract holds regardless
    // measure the spread the way the router sees it
    val salts = probe.select(org.apache.spark.sql.functions.pmod(
        xxhash64(graft.util.ContentSalt(probe, 4),
          monotonically_increasing_id()), lit(4)).as("s"))
      .distinct().count()
    assert(salts > 1, "identical rows must not collapse onto one salt")
  }

  test("reserved and duplicate column names reject with clear messages") {
    import spark.implicits._
    val bad = Seq((1L, 0L)).toDF("k", "__hot_key")
    val build = Seq((1L, 10)).toDF("j", "bv")
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(bad, build, "k", "j", 2, 2))
    val probe = Seq((1L, "x")).toDF("k", "shared")
    val build2 = Seq((1L, "y")).toDF("j", "shared")
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(probe, build2, "k", "j", 2, 2))
  }
}
