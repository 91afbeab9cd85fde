package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Benchmark main: per-query wall times + shuffle/spill telemetry as one
  * JSON line.
  *
  * Cache hygiene: every query is timed from an identical cache state — the
  * resident graph materialized, nothing else. After each query all caches are
  * cleared (operators may cache scratch intermediates, e.g. shingle tables)
  * and the graph is re-warmed OUTSIDE the timed region; without this,
  * accumulated scratch caches from 49 queries evict each other and full-run
  * timings diverge from isolated runs by up to ~100x in both directions
  * (measured in round 1).
  *
  * Telemetry: a SparkListener accumulates task-level shuffle read/write and
  * spill bytes; the listener bus is drained before each snapshot so the
  * deltas attribute every task of the just-finished job to its query. Plan
  * regressions (an extra exchange, a lost partial agg) then show up
  * numerically even when wall-time noise masks them.
  *
  * Failures are reported, not swallowed: a crashing query lands in the
  * "errors" map (and on stderr) instead of silently contributing a bogus
  * timing with rc=0.
  */
object Bench {

  private final class TaskMetricsListener extends SparkListener {
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val spilled = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snapshot(): (Long, Long, Long) = (shuffleRead.get, shuffleWrite.get, spilled.get)
  }

  private final case class QueryMetrics(shuffleRead: Long, shuffleWrite: Long, spilled: Long)

  /** Flat `"key":{ "a":1.2, "b":3 }` object out of a record this program
    * itself wrote (no nested braces inside the object, names are query
    * identifiers) — a five-line extractor beats a JSON dependency the
    * build deliberately doesn't have. */
  private def jsonNumMap(json: String, key: String): Map[String, Double] = {
    val tag = "\"" + key + "\":{"
    val at = json.indexOf(tag)
    if (at < 0) return Map.empty
    val start = at + tag.length
    val end = json.indexOf('}', start)
    if (end < 0) return Map.empty
    json.substring(start, end).split(',').iterator.flatMap { kv =>
      val i = kv.lastIndexOf(':')
      if (i < 0) None
      else {
        val k = kv.take(i).trim.stripPrefix("\"").stripSuffix("\"")
        try Some(k -> kv.drop(i + 1).trim.toDouble)
        catch { case _: NumberFormatException => None }
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Last committed full record, read BEFORE this run overwrites it: the
    // reference point for the calibration-aware elevation pass below.
    val prior: Option[(Map[String, Double], Double)] = try {
      val p = java.nio.file.Paths.get("BENCH_LAST.json")
      if (!java.nio.file.Files.exists(p)) None
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val pq = jsonNumMap(txt, "queries")
        val pc = jsonNumMap(txt, "calib")
        val calibSum = pc.getOrElse("cpu", 0.0) + pc.getOrElse("spark", 0.0)
        if (pq.nonEmpty && calibSum > 0) Some((pq, calibSum)) else None
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] prior record unreadable: ${e.getMessage}"); None }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev knob: extra session confs as "k=v;k2=v2" (e.g. A/B-testing AQE
    // or shuffle sizing against a bench run without a rebuild)
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(';').filter(_.contains('=')).map { kv =>
        val i = kv.indexOf('='); (kv.take(i).trim, kv.drop(i + 1).trim)
      }
    val spark = extra.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    // load phase: resident graph + stats (not attributed to any query)
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] warm failed: ${e.getMessage}") }
    // Host calibration: the per-round records come from shared hosts whose
    // effective speed drifts 1.3-1.7x between rounds (measured in r12 by
    // rerunning the round-9 BUILD: it reproduced the "regressed" round-11
    // numbers bit-for-bit-same code). Two fixed workloads — a JIT-warmed
    // single-thread scalar loop and an all-cores Spark hash-aggregate —
    // recorded in the JSON so cross-round ratios can be drift-normalized
    // (tools/bench_diff.py divides by the calib ratio when both records
    // carry one). Runs AFTER warm so the JVM/session state matches queries.
    val (calibCpu, calibSpark) = {
      def spin(iters: Int): Double = {
        var s = 0.0; var i = 0
        while (i < iters) { s += java.lang.Math.sin(i.toDouble); i += 1 }
        s
      }
      val warmSink = spin(2000000) // JIT the loop before timing it
      val t0 = System.nanoTime()
      val sink = spin(20000000)
      val cpu = (System.nanoTime() - t0) / 1e9
      import org.apache.spark.sql.functions.{col, hash, sum}
      spark.range(1L << 24).select(sum(hash(col("id")).cast("long"))).collect()
      val t1 = System.nanoTime()
      spark.range(1L << 28).select(sum(hash(col("id")).cast("long"))).collect()
      val sp = (System.nanoTime() - t1) / 1e9
      // reference the sinks so the scalar loop cannot be eliminated
      if (java.lang.Double.isNaN(warmSink + sink)) System.err.println("")
      (cpu, sp)
    }
    System.err.println(f"[bench] calib cpu=$calibCpu%.3f s spark=$calibSpark%.3f s")
    // canonical cache state = whatever warm materialized; everything an
    // individual query persists on top (shingle caches, iteration state,
    // localCheckpoints) is scratch and gets dropped after the query — much
    // cheaper than clearCache + re-warming the graph 49 times, and it keeps
    // the resident-graph posture identical for every query.
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def dropScratch(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = false)
      }
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, QueryMetrics, Option[String]) = {
      org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
      val (r0, w0, s0) = listener.snapshot()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
      val (r1, w1, s1) = listener.snapshot()
      dropScratch() // untimed: reset to the canonical cache state
      (dt, QueryMetrics(r1 - r0, w1 - w0, s1 - s0), err)
    }
    // optional query-name filter args (dev use; driver passes none)
    val wanted = if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    val results = wanted.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (dt, qm, err) = timed(fn)
      err.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
      System.err.println(f"[bench] $name%-26s ${dt}%.2f s" + err.fold("")(" ERR " + _))
      (name, dt, qm, err)
    }
    // Noise guard: shared hosts see transient CPU-steal storms that inflate
    // a random contiguous block of queries 10-100x (measured: the same query
    // 303.9 s mid-storm, 2.7 s quiet). Re-run the outliers once and keep the
    // per-query minimum — a genuine cost reproduces, a storm does not. An
    // outlier whose retry is ALSO hot gets one more attempt after the whole
    // retry pass (storms are contiguous; post-pass is the cheapest "later");
    // a query hot on every attempt lands in the `suspect` list. ALL attempt
    // times are reported (`retries` map) so bimodal costs stay visible.
    val med = results.map(_._2).sorted.apply(results.size / 2)
    // cap sized to a worst-case storm: one contiguous block can contaminate
    // ~20 of 90+ queries (measured); 12 left real outliers unretried
    val outliers = results
      .filter { case (_, dt, _, err) => err.isEmpty && dt > math.max(3 * med, 5.0) }
      .sortBy(-_._2).take(20)
    // Retries run with retainScratch=true: the outlier hypothesis is "storm
    // noise", so the retry must measure the PLAN, not a cold recompute of a
    // result whose scratch caches the first run's releaseOnFirstAction
    // listener already dropped (r4 driver evidence: pagerank first 12.9 s,
    // retry 71.9 s — the retry re-acted on a released chain mid-storm).
    // timed()'s dropScratch() still resets the cache state afterwards, so
    // retained scratch never leaks into the next retry.
    def retryOnce(name: String): (Double, QueryMetrics, Option[String]) = {
      spark.conf.set(graft.util.CacheLifecycle.RetainScratchKey, "true")
      try timed(wanted(name))
      finally spark.conf.unset(graft.util.CacheLifecycle.RetainScratchKey)
    }
    val hotBar = math.max(3 * med, 5.0)
    val retried1 = outliers.map { case (name, first, firstQm, _) =>
      val (dt, qm, err) = retryOnce(name)
      System.err.println(f"[bench] retry $name%-20s ${dt}%.2f s -> ${math.min(first, dt)}%.2f s")
      // an ERRORED retry contributes no attempt: its fast-fail wall time
      // must not replace the genuine first-run measurement
      name -> (Seq((first, firstQm)) ++ (if (err.isEmpty) Seq((dt, qm)) else Seq.empty))
    }.toMap
    // Storm-outlasted-one-retry guard: when an outlier's retry is ALSO hot
    // (the min of both attempts still exceeds the bar), the first retry
    // proved nothing — storms are contiguous in time, so the cheapest
    // "later" is after the whole retry pass. One more attempt then; a query
    // hot on ALL attempts is flagged `suspect` in the record so a
    // contaminated total is machine-detectable rather than silently bogus.
    val stormRetried = retried1.map { case (name, attempts) =>
      if (attempts.map(_._1).min > hotBar) {
        val (dt, qm, err) = retryOnce(name)
        System.err.println(f"[bench] retry2 $name%-19s ${dt}%.2f s")
        name -> (attempts ++ (if (err.isEmpty) Seq((dt, qm)) else Seq.empty))
      } else name -> attempts
    }
    // Calibration-aware elevation pass (vs the LAST COMMITTED record): the
    // storm logic above is absolute (3x this run's own median) — it cannot
    // see a sub-median query that silently tripled since last round, so the
    // r12 driver record carried 5-7x phantom moves on sub-second queries
    // with suspect:[], indistinguishable from real regressions. Here each
    // query is compared against the prior record, normalized by the
    // fixed-workload calib probes' host drift (same convention as
    // tools/bench_diff.py); anything elevated >2x gets one warm rerun
    // (min kept), and what REMAINS elevated is flagged `suspect` — the
    // record itself then separates noise (rerun recovers) from regression
    // (flagged). Skipped on name-filtered dev runs (subset runs JIT-warm
    // less, so every comparison vs a full-run record would false-flag).
    // r14: multi-second queries trigger at 1.5x (the r13 record carried a
    // 1.6x move on a 2-second query unrerun and unflagged — the blind band
    // between the old uniform 2x bar and the suspect machinery); sub-second
    // priors keep 2x (job-floor jitter band), and the 0.5 s floor stands.
    def elevBar(priorVal: Double): Double = if (priorVal >= 1.0) 1.5 else 2.0
    val elevFloor = 0.5 // below this the job floor dominates; jitter, not signal
    val drift = prior.map { case (_, pCalib) => (calibCpu + calibSpark) / pCalib }
    def elevatedVsPrior(name: String, t: Double): Boolean = (prior, drift) match {
      case (Some((pq, _)), Some(d)) =>
        t > elevFloor && pq.get(name).exists(p => t / (p * d) > elevBar(p))
      case _ => false
    }
    drift.foreach(d => System.err.println(f"[bench] calib drift vs prior record: $d%.3f"))
    val retried: Map[String, Seq[(Double, QueryMetrics)]] =
      if (args.nonEmpty || prior.isEmpty) stormRetried
      else results.foldLeft(stormRetried) { case (acc, (name, first, firstQm, err)) =>
        val attempts = acc.getOrElse(name, Seq((first, firstQm)))
        val best = attempts.map(_._1).min
        if (err.isDefined || !elevatedVsPrior(name, best)) acc
        else {
          val (dt, qm, rerr) = retryOnce(name)
          System.err.println(f"[bench] elev-retry $name%-17s ${dt}%.2f s (prior-normalized elevation)")
          acc.updated(name, attempts ++ (if (rerr.isEmpty) Seq((dt, qm)) else Seq.empty))
        }
      }
    val finalResults = results.map { case (n, t, qm, e) =>
      retried.get(n) match {
        case Some(attempts) =>
          val (bestT, bestQm) = attempts.minBy(_._1)
          (n, bestT, bestQm, e)
        case None => (n, t, qm, e)
      }
    }
    // `suspect` marks a final value that may STILL be storm-contaminated:
    // the query stayed above the bar AND its attempts disagree by > 2x (a
    // genuine cost reproduces tightly across attempts spread over the run —
    // e.g. 11.2/10.5/9.3 s is an expensive query, not a storm; 70/71/4 s is
    // a storm that outlasted two attempts). Fewer than 3 recorded attempts
    // (an errored retry) can't be cross-checked and stays suspect.
    // judged on the STORM pass's own attempts (stormRetried, not the merged
    // map): the `sizeIs < 3` clause means "an errored storm retry can't be
    // cross-checked" — an elevation-pass entry also has 2 attempts and
    // would false-flag a query whose rerun legitimately recovered
    val stormSuspects = finalResults.collect {
      case (n, t, _, err) if err.isEmpty && t > hotBar && stormRetried.get(n).exists { at =>
        val ts = at.map(_._1)
        ts.sizeIs < 3 || ts.max > 2 * ts.min
      } => n
    }
    // still >2x the drift-normalized prior after its warm rerun → the
    // elevation reproduced; flag it so the record names the regression.
    // Full runs only: a subset run never did the elevation rerun (and its
    // thinner JIT warm would false-flag against a full-run record anyway)
    val elevSuspects = if (args.nonEmpty) Seq.empty[String]
    else finalResults.collect {
      case (n, t, _, None) if elevatedVsPrior(n, t) => n
    }
    val suspects = (stormSuspects ++ elevSuspects).distinct.sorted
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val qs = finalResults.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val metrics = finalResults.map { case (k, _, qm, _) =>
      s"\"$k\":{\"shuffle_read\":${qm.shuffleRead},\"shuffle_write\":${qm.shuffleWrite},\"spilled\":${qm.spilled}}"
    }.mkString("{", ",", "}")
    val retries = retried.toSeq.sortBy(_._1).map { case (k, attempts) =>
      val names = "first" +: (1 until attempts.size).map(i => if (i == 1) "retry" else s"retry$i")
      val fields = names.zip(attempts.map(_._1))
        .map { case (f, v) => s"\"$f\":$v" }.mkString(",")
      s"\"$k\":{$fields}"
    }.mkString("{", ",", "}")
    val errs = finalResults.collect { case (k, _, _, Some(m)) => s"\"${esc(k)}\":\"${esc(m)}\"" }
      .mkString("{", ",", "}")
    val suspectJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = finalResults.map(_._2).sum
    val calib = s"""{"cpu":$calibCpu,"spark":$calibSpark}"""
    val driftField = drift.fold("")(d => s""""calib_drift_vs_prior":$d,""")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","calib":$calib,$driftField"queries":$qs,"metrics":$metrics,"retries":$retries,"suspect":$suspectJson,"errors":$errs,"sf":"$sfDir"}"""
    // The full line (~20 KB at 190 queries) exceeds the driver's 2000-char
    // stdout capture window — every BENCH_r*.json through r8 recorded
    // parsed:null with a mid-line tail. Persist the complete record to a
    // file, and keep stdout to EXACTLY ONE compact line that fits the
    // window whole (so the captured tail is a complete JSON document no
    // matter how it is parsed: whole-tail, last-line, or regex).
    // A name-filtered dev run records to BENCH_SUBSET.json — it must never
    // clobber the last FULL record in BENCH_LAST.json.
    val recordFile = if (args.nonEmpty) "BENCH_SUBSET.json" else "BENCH_LAST.json"
    try java.nio.file.Files.write(java.nio.file.Paths.get(recordFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] $recordFile write failed: $e") }
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val slowest = finalResults.sortBy(-_._2).take(25)
      .map { case (k, v, _, _) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val errCount = finalResults.count(_._4.isDefined)
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${finalResults.size},"errors":$errCount,"retried":${retried.size},"suspect":$suspectJson,"calib":{"cpu":${r3(calibCpu)},"spark":${r3(calibSpark)}},"queries":$slowest,"note":"queries = slowest 25 of ${finalResults.size}; full per-query record in $recordFile","sf":"$sfDir"}""")
    spark.stop()
    if (finalResults.exists(_._4.isDefined)) sys.exit(1)
  }
}
