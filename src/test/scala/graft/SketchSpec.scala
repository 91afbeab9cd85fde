package graft

import graft.sketch.Sketches

/** KMV distinct sketch: exact under k, estimator replay above k, merge
  * determinism across partition layouts. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("kmv: exact count when distinct values < k") {
    val d = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("a", "z"), ("b", "x"))
      .toDF("g", "v")
    val got = Sketches.kmvDistinct(d, "g", $"v", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 3.0, "b" -> 1.0))
  }

  test("kmv: k-th order statistic estimate matches the JVM replay") {
    val n = 500
    val d = (1 to n).map(i => ("g", s"tok$i")).toDF("g", "v")
    val k = 16
    val hashes = (1 to n).map(i => md5hex(s"tok$i")).sorted
    val hk = java.lang.Long.parseLong(hashes(k - 1).substring(0, 15), 16)
    val expect = BigDecimal((k - 1).toDouble * 1152921504606846976.0 / hk.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Sketches.kmvDistinct(d, "g", $"v", k)
      .collect()(0).getDouble(1)
    assert(got == expect)
    // sanity: the estimate is within 2x of truth at k = 16
    assert(got > n / 2.0 && got < n * 2.0)
  }

  test("kmv: estimate is layout-independent (merge associativity)") {
    val d = (1 to 300).map(i => ("g", s"tok${i % 120}")).toDF("g", "v")
    val one = Sketches.kmvDistinct(d.coalesce(1), "g", $"v", 32).collect()(0).getDouble(1)
    val many = Sketches.kmvDistinct(d.repartition(13), "g", $"v", 32).collect()(0).getDouble(1)
    assert(one == many)
  }
}
