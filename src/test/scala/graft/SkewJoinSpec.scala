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

  test("saltedJoinStable: batch parity with the plain join, both paths hit") {
    import spark.implicits._
    val probe = Seq((1L, "a", 100L), (1L, "b", 101L), (1L, "b", 101L), (2L, "d", 103L))
      .toDF("k", "pv", "eid")
    val build = Seq((1L, 10), (1L, 11), (2L, 20), (4L, 40)).toDF("j", "bv")
    val salted = SkewJoin.saltedJoinStable(probe, build, "k", "j",
      salts = 3, hotThreshold = 3, tiebreakCol = "eid") // key 1 hot, key 2 cold
    assertSameBag(salted, probe.join(build, col("k") === col("j")))
  }

  test("stable salt is a pure function of row data: layout changes don't move it") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (1L, s"v${i % 5}", 1000L + i))
    def saltsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("eid"), pmod(
          xxhash64(graft.util.ContentSalt(df, 4), col("eid")), lit(4)).as("s"))
        .as[(Long, Long)].collect().toMap
    val a = saltsOf(rows.toDF("k", "pv", "eid").repartition(1))
    val b = saltsOf(rows.toDF("k", "pv", "eid").repartition(7))
    assert(a == b, "run-stable salt must not depend on physical layout")
    assert(a.values.toSet.size > 1, "distinct tiebreaks must spread across salts")
  }

  test("saltedJoinWithHotKeys: stream-stream join equals the batch plain join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val probeRows = Seq((1L, "a", 100L), (1L, "same", 101L), (1L, "same", 102L),
      (2L, "d", 103L), (3L, "e", 104L))
    val buildRows = Seq((1L, 10), (1L, 11), (2L, 20), (4L, 40))
    val hotKeys = Seq(1L).toDF("hk")
    val plain = probeRows.toDF("k", "pv", "eid")
      .join(buildRows.toDF("j", "bv"), col("k") === col("j")).drop("j")
    // batch parity through the same entry point first
    assertSameBag(SkewJoin.saltedJoinWithHotKeys(probeRows.toDF("k", "pv", "eid"),
      buildRows.toDF("j", "bv"), "k", "j", 3, hotKeys, "eid").drop("j"), plain)
    // now as a genuine stream-stream join: probe and build arrive in
    // interleaved micro-batches; a run-unstable salt would mis-key state
    // for the build row arriving AFTER its hot probe rows
    val pin = MemoryStream[(Long, String, Long)]
    val bin = MemoryStream[(Long, Int)]
    val q = SkewJoin.saltedJoinWithHotKeys(pin.toDF().toDF("k", "pv", "eid"),
        bin.toDF().toDF("j", "bv"), "k", "j", 3, hotKeys, "eid").drop("j")
      .writeStream.format("memory").queryName("ssalt").outputMode("append").start()
    try {
      pin.addData(probeRows.take(3): _*)
      bin.addData(buildRows.take(2): _*)
      q.processAllAvailable()
      pin.addData(probeRows.drop(3): _*)
      bin.addData(buildRows.drop(2): _*) // build for key 2 arrives after its probe row
      q.processAllAvailable()
      assertSameBag(spark.table("ssalt"), plain)
    } finally q.stop()
  }

  test("duplicate keys in the caller's hotKeys frame do not replicate rows") {
    import spark.implicits._
    // the left_outer mark join would emit one copy per duplicate hot key —
    // a caller-built hot list (yesterday's profile) can easily carry dups
    val probe = Seq((1L, "a", 100L), (1L, "b", 101L), (2L, "c", 102L)).toDF("k", "pv", "eid")
    val build = Seq((1L, 10), (2L, 20)).toDF("j", "bv")
    val dupHot = Seq(1L, 1L, 1L).toDF("hk")
    val out = SkewJoin.saltedJoinWithHotKeys(probe, build, "k", "j", 3, dupHot, "eid")
    assertSameBag(out.drop("j"), probe.join(build, col("k") === col("j")).drop("j"))
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
