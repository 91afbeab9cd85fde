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
}
