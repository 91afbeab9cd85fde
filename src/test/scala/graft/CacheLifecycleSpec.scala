package graft

import org.apache.spark.sql.functions._
import graft.util.CacheLifecycle

/** Lifecycle contract of releaseOnFirstAction: default releases the scratch
  * cache after the first action on the result; the retainScratch session
  * conf opts out and leaves the cache to the caller. */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def cachedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("default: scratch unpersisted after first action on result") {
    val before = cachedCount
    val scratch = (1 to 100).toDF("x").persist()
    scratch.count()
    val result = CacheLifecycle.releaseOnFirstAction(
      scratch.groupBy(col("x") % 10 as "k").agg(sum("x").as("s")), scratch)
    assert(cachedCount == before + 1)
    assert(result.count() == 10)
    // listener delivery is async — bounded wait for the unpersist to land
    val deadline = System.nanoTime() + 10e9.toLong
    while (cachedCount > before && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cachedCount == before, "scratch cache should be released after the action")
  }

  test("retainScratch conf: caches stay; caller owns lifecycle") {
    val before = cachedCount
    spark.conf.set(CacheLifecycle.RetainScratchKey, "true")
    try {
      val scratch = (1 to 100).toDF("x").persist()
      scratch.count()
      val result = CacheLifecycle.releaseOnFirstAction(
        scratch.groupBy(col("x") % 10 as "k").agg(sum("x").as("s")), scratch)
      assert(result.count() == 10)
      Thread.sleep(500) // would be enough for an async release to land
      assert(cachedCount == before + 1, "scratch must survive actions under retainScratch")
      scratch.unpersist(blocking = true)
      assert(cachedCount == before)
    } finally spark.conf.unset(CacheLifecycle.RetainScratchKey)
  }
}
