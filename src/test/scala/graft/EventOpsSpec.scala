package graft

import graft.events.EventOps
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join picks latest right row at or before left time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3")
    ).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (2L, ts("2024-01-01 10:00:15"), 200.0)  // after t3 → no match
    ).toDF("key", "ts", "px")
    val got = EventOps.asofJoin(trades, quotes, "key", "ts", Seq("px"))
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(got == Map("t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> None))
  }

  test("asof join: simultaneous right row is visible") {
    val l = Seq((1L, ts("2024-01-01 10:00:10"), "x")).toDF("key", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 10:00:10"), 7.0)).toDF("key", "ts", "px")
    val got = EventOps.asofJoin(l, r, "key", "ts", Seq("px")).collect()(0)
    assert(got.getDouble(3) == 7.0)
  }

  test("asof forward picks earliest right row at or after; tolerance masks far matches") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),  // next quote at :10 (5 s away)
      (1L, ts("2024-01-01 10:00:20"), "t2"),  // next quote at 10:05:00 (280 s away)
      (2L, ts("2024-01-01 10:00:10"), "t3")   // no later quote
    ).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (1L, ts("2024-01-01 10:05:00"), 102.0),
      (2L, ts("2024-01-01 10:00:00"), 200.0)  // before t3 → no forward match
    ).toDF("key", "ts", "px")
    val fwd = EventOps.asofJoin(trades, quotes, "key", "ts", Seq("px"), forward = true)
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(fwd == Map("t1" -> Some(101.0), "t2" -> Some(102.0), "t3" -> None))
    val tol = EventOps.asofJoin(trades, quotes, "key", "ts", Seq("px"),
      forward = true, toleranceMillis = Some(60000L))
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(tol == Map("t1" -> Some(101.0), "t2" -> None, "t3" -> None))
    // simultaneous right row is visible forward too (≥ is inclusive)
    val simul = EventOps.asofJoin(trades,
      Seq((1L, ts("2024-01-01 10:00:05"), 99.0)).toDF("key", "ts", "px"),
      "key", "ts", Seq("px"), forward = true)
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(simul("t1").contains(99.0))
  }

  test("range join: binned decomposition equals brute-force theta join (seeded)") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    // timestamps landing on exact bin edges and delta-exact gaps included
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val off = rnd.nextInt(40) * 30000L // 30 s grid, delta = 60 s → edge hits
      (rnd.nextInt(4).toLong, new java.sql.Timestamp(base + off), s"$tag$i")
    }
    val l = mk(60, "l").toDF("k", "ts", "lid")
    val r = mk(60, "r").toDF("k", "ts", "rid")
    val delta = 60000L
    val got = EventOps.rangeJoin(l, r, "k", "ts", "ts", delta, Seq("rid"))
      .select("lid", "r_rid").collect().map(x => (x.getString(0), x.getString(1)))
    val lr = l.collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime, x.getString(2)))
    val rr = r.collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime, x.getString(2)))
    val expect = for {
      (lk, lt, lid) <- lr; (rk, rt, rid) <- rr
      if lk == rk && math.abs(lt - rt) <= delta
    } yield (lid, rid)
    assert(got.sorted.toSeq == expect.sorted.toSeq) // incl. no duplicate pairs
    assert(expect.nonEmpty)
    // a pair exactly delta apart joins; delta + 1 ms does not (and the
    // second pair crosses a bin boundary relative to the first)
    val l2 = Seq((9L, new java.sql.Timestamp(base), "a"),
                 (9L, new java.sql.Timestamp(base + 100000L), "b")).toDF("k", "ts", "lid")
    val r2 = Seq((9L, new java.sql.Timestamp(base + delta), "x"),
                 (9L, new java.sql.Timestamp(base + 100000L + delta + 1), "y")).toDF("k", "ts", "rid")
    val g2 = EventOps.rangeJoin(l2, r2, "k", "ts", "ts", delta, Seq("rid"))
      .select("lid", "r_rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(g2 == Set(("a", "x"), ("b", "x") /* 100000−60000 = 40000 ≤ delta */ ))
  }

  test("funnel: stage gated on strictly-after ordering, per key") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      // u2: purchase BEFORE the first view→click chain completes → stage 2
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "click"),
      // u3: click only (no view first) → stage 0
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // u4: simultaneous view+click does NOT advance (strictly after)
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 1))
  }

  test("ohlc: open/close pick by (ts, event_id) order, ties broken by id") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 9.0), // same ts: id 1 wins open
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 7.0)
    ).toDF("event_id", "ts", "value")
    val r = ev.agg(
      min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
      max(col("value")).as("high"), min(col("value")).as("low"),
      max_by(col("value"), struct(col("ts"), col("event_id"))).as("close")).collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) == (5.0, 9.0, 1.0, 7.0))
  }

  test("sessionize splits on gaps over threshold") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),   // same session (10 min)
      (1L, ts("2024-01-01 11:00:00")),   // new session (50 min gap)
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventOps.sessionize(ev, "user_id", "ts", 1800)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }
}
