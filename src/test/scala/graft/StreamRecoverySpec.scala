package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{GEvent, StreamOps}

/**
 * Crash-recovery contract for the custom-state streaming operators: a query
 * stopped mid-input and RESTARTED from its checkpoint directory must produce,
 * over the two runs combined, exactly the rows of an uninterrupted run — i.e.
 * the `flatMapGroupsWithState` state (open sessions, EWMA lag windows, funnel
 * stages, SCD2 open versions) round-trips through the checkpoint store. The
 * batch≡stream specs in StreamingSpec prove the VALUES; this spec proves the
 * RESTART half of the streaming contract (VERDICT r11 "what's missing" #2).
 *
 * Each scenario is built so the interesting emission happens AFTER the
 * restart and is only correct if pre-restart state survived: a session whose
 * event count spans the boundary, an EWMA whose lags cross it, a funnel stage
 * advance gated on a pre-restart stage, an SCD2 close whose version counter
 * was incremented before the stop.
 */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Run `mk` over `batches` as a foreachBatch append stream (the memory
    * sink refuses checkpoint recovery; foreachBatch is the fault-tolerant
    * collector), stopping the query after `splitAt` batches and restarting
    * a NEW query instance from the SAME checkpoint directory for the rest.
    * Returns the union of rows emitted by the two runs. */
  private def runWithRestart[O](mk: Dataset[GEvent] => Dataset[O],
                                batches: Seq[Seq[GEvent]], splitAt: Int)
                               (implicit enc: Encoder[O]): Seq[O] = {
    require(splitAt > 0 && splitAt < batches.length)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val in = MemoryStream[GEvent]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[O]()
    val collectFn: (Dataset[O], Long) => Unit =
      (df, _) => { sink.addAll(df.collect().toSeq.asJava); () }
    def start() = mk(in.toDS())
      .writeStream.foreachBatch(collectFn)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      batches.take(splitAt).foreach { b => in.addData(b: _*); q1.processAllAvailable() }
    } finally q1.stop()
    q1.awaitTermination()
    // input arriving while the query is DOWN — the restart must pick it up
    // from the checkpointed offsets, with the old state
    batches.drop(splitAt).foreach(b => in.addData(b: _*))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    sink.iterator().asScala.toSeq
  }

  /** The reference: the same batches through one uninterrupted query. */
  private def runUninterrupted[O](mk: Dataset[GEvent] => Dataset[O],
                                  batches: Seq[Seq[GEvent]])
                                 (implicit enc: Encoder[O]): Seq[O] = {
    val in = MemoryStream[GEvent]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[O]()
    val collectFn: (Dataset[O], Long) => Unit =
      (df, _) => { sink.addAll(df.collect().toSeq.asJava); () }
    val q = mk(in.toDS())
      .writeStream.foreachBatch(collectFn)
      .outputMode("append").start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    sink.iterator().asScala.toSeq
  }

  private def prove[O](mk: Dataset[GEvent] => Dataset[O],
                       batches: Seq[Seq[GEvent]], splitAt: Int)
                      (implicit enc: Encoder[O], ord: Ordering[O]): Seq[O] = {
    val recovered = runWithRestart(mk, batches, splitAt).sorted
    val reference = runUninterrupted(mk, batches).sorted
    assert(recovered == reference,
      s"restart-from-checkpoint output diverged from the uninterrupted run:\n" +
        s"  recovered: $recovered\n  reference: $reference")
    recovered
  }

  test("sessionizeStateful: an open session survives restart — closed later with its full count") {
    // batch 1 opens user 1's session (2 events, stays in state); after the
    // restart an in-gap event EXTENDS it and a late event gap-closes it —
    // n_events = 3 across the boundary is only possible with recovered state
    val batches = Seq(
      Seq(GEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
          GEvent(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0)),
      Seq(GEvent(3, ts("2024-01-01 10:20:00"), 1, "click", 4.0)),
      Seq(GEvent(4, ts("2024-01-01 13:00:00"), 1, "click", 8.0)))
    val rows = prove[(Long, String, Long, Double)](
      ds => StreamOps.sessionizeStateful(ds, gapSeconds = 1800)
        .select($"user_id", $"session_start".cast("string"), $"n_events", $"sum_value")
        .as[(Long, String, Long, Double)],
      batches, splitAt = 1)
    assert(rows.contains((1L, "2024-01-01 10:00:00", 3L, 7.0)),
      s"the boundary-spanning session must close with all 3 events: $rows")
  }

  test("ewmaStateful: lag window survives restart — post-restart values use pre-restart lags") {
    // 8 in-order events for one key, stop after 3: events 4..8's EWMA mixes
    // lags from before the stop, so equality with the uninterrupted run
    // proves the recent-values state recovered bit-for-bit
    val evs = (1 to 8).map(i =>
      GEvent(i.toLong, ts(f"2024-01-01 10:${i * 5}%02d:00"), 1L, "t", (i * 7 % 5 + 1).toDouble))
    val batches = Seq(evs.take(3), evs.slice(3, 6), evs.drop(6))
    val rows = prove[(Long, Long, Double)](
      ds => StreamOps.ewmaStateful(ds).map(g => (g.event_id, g.user_id, g.ewma)),
      batches, splitAt = 1)
    assert(rows.size == 8 && rows.map(_._1).toSet == (1L to 8L).toSet)
  }

  test("funnelStateful: stage survives restart — post-restart advances build on it") {
    // view lands before the stop; click + purchase after the restart can
    // only advance to stages 2 and 3 if stage-1 state recovered
    val batches = Seq(
      Seq(GEvent(1, ts("2024-01-01 10:00:00"), 1, "view", 0)),
      Seq(GEvent(2, ts("2024-01-01 10:05:00"), 1, "click", 0),
          GEvent(3, ts("2024-01-01 10:10:00"), 1, "purchase", 0)))
    val rows = prove[(Long, Int)](
      ds => StreamOps.funnelStateful(ds, Seq("view", "click", "purchase"))
        .map(f => (f.user_id, f.stage)),
      batches, splitAt = 1)
    assert(rows == Seq((1L, 1), (1L, 2), (1L, 3)))
  }

  test("scd2Stream: open version + version counter survive restart") {
    // A→B closes version 1 before the stop; B→C after the restart must
    // close version 2 (counter recovered) with B's valid_from (open row
    // recovered) — then C stays open in state, unemitted, like the
    // uninterrupted run
    val batches = Seq(
      Seq(GEvent(1, ts("2024-01-01 10:00:00"), 1, "A", 0),
          GEvent(2, ts("2024-01-01 11:00:00"), 1, "B", 0)),
      Seq(GEvent(3, ts("2024-01-01 12:00:00"), 1, "C", 0)))
    val rows = prove[(Long, String, Long, Option[Long], Long)](
      ds => StreamOps.scd2Stream(ds)
        .map(v => (v.user_id, v.event_type, v.valid_from_ms, v.valid_to_ms, v.version)),
      batches, splitAt = 1)
    assert(rows.map(r => (r._2, r._5)) == Seq(("A", 1L), ("B", 2L)),
      s"expected versions 1 (A) and 2 (B) closed in order: $rows")
  }

  test("windowedAgg: built-in window-aggregate state survives restart (append emission)") {
    // day-1 events before the stop; the day-2 event after the restart
    // advances the watermark past day 1 and flushes its windows — counts
    // are only right if the checkpointed partial aggregates recovered
    val batches = Seq(
      Seq(GEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
          GEvent(2, ts("2024-01-01 15:00:00"), 1, "click", 2.0)),
      Seq(GEvent(3, ts("2024-01-03 09:00:00"), 2, "view", 4.0)))
    val rows = prove[(String, String, Long, Double)](
      ds => StreamOps.windowedAgg(ds.toDF(), "1 day")
        .select($"w_start".cast("date").cast("string"), $"event_type", $"n", $"sum_value")
        .as[(String, String, Long, Double)],
      batches, splitAt = 1)
    assert(rows.contains(("2024-01-01", "click", 2L, 3.0)),
      s"day-1 window must flush post-restart with BOTH pre-restart events: $rows")
  }
}
