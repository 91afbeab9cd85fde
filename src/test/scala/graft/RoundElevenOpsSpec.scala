package graft

import graft.events.EventOps
import graft.ml.Similarity
import graft.sketch.Sketches
import graft.text.TextOps
import graft.algorithms.Algorithms
import org.apache.spark.sql.functions._

/** Hand-computed unit cases for the round-11 operators whose primary
  * evidence is the DuckDB oracle — a local failure here localizes a bug
  * faster than a hash mismatch over 60k rows. */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("connectedComponentsApply: any edge split folds to the full rebuild") {
    // seeded random graph; three different old/new splits must all compose
    val rnd = new scala.util.Random(7)
    val edges = (1 to 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
    val full = Algorithms.connectedComponents(vs, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(0.2, 0.5, 0.8).foreach { fr =>
      val (e1, e2) = edges.partition(e => (e._1 * 31 + e._2) % 10 < fr * 10)
      val v1 = e1.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
      val old = Algorithms.connectedComponents(v1, e1.toDF("src", "dst"))
      val got = Algorithms.connectedComponentsApply(old, e2.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == full, s"split $fr: incremental != full rebuild")
    }
  }

  test("reciprocity: mutual pair among three edges; loops and dups ignored") {
    val es = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (4L, 4L)).toDF("src", "dst")
    val r = Algorithms.reciprocity(es).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L &&
      math.abs(r.getDouble(2) - 2.0 / 3) < 1e-6)
  }

  test("decayedCounts: staircase weights 1, 1/2, 1/4 at 0, 1, 2 half-lives") {
    val ev = Seq(
      (1L, ts("2024-01-03 00:00:00"), "a"),
      (2L, ts("2024-01-02 00:00:00"), "a"),
      (3L, ts("2024-01-01 00:00:00"), "a")).toDF("event_id", "ts", "event_type")
    val out = EventOps.decayedCounts(ev, Seq("event_type"), "ts", 86400L).collect()(0)
    assert(out.getLong(1) == 3L && out.getDouble(2) == 1.75)
  }

  test("robustAnomalies: one huge outlier flags; it cannot inflate the MAD away") {
    val rows = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }.toDF("event_id", "event_type", "value")
    val flagged = EventOps.robustAnomalies(rows, Seq("event_type"), "value")
      .filter(col("is_anomaly")).collect()
    assert(flagged.map(_.getAs[Long]("event_id")).toSet == Set(9L))
    // med 5.5, MAD 2.5 -> z = 94.5 / (1.4826 * 2.5)
    assert(math.abs(flagged(0).getAs[Double]("robust_z") - 94.5 / (1.4826 * 2.5)) < 1e-4)
  }

  test("transitionMatrix: counts and conditional probabilities per from-type") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "a"),
      (4L, 2L, ts("2024-01-01 10:00:00"), "a"),
      (5L, 2L, ts("2024-01-01 10:01:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 1.0))))
  }

  test("activeUsers: DAU exact; trailing window unions the right days") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-05 10:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.activeUsers(ev, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    // day 1: dau 2, window {1,2}; day 2: dau 1, window days 1-2 -> {1,2};
    // day 5: dau 1, window days 3-5 -> {3}
    assert(got == Map("2024-01-01" -> ((2L, 2L)), "2024-01-02" -> ((1L, 2L)),
      "2024-01-05" -> ((1L, 1L))))
  }

  test("dedupNormalized: punctuation/case/whitespace variants share one fingerprint") {
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "different entirely")).toDF("doc_id", "text")
    val got = TextOps.dedupNormalized(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("cmsInnerProduct: collision-free tables give the exact join size") {
    val a = (1 to 20).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong)).toDF("k")
    val b = (1 to 10).flatMap(k => Seq.fill(2)(k.toLong)).toDF("k")
    val est = Sketches.cmsInnerProduct(
      Sketches.cmsTable(a, col("k"), lit(1L), d = 4, w = 512),
      Sketches.cmsTable(b, col("k"), lit(1L), d = 4, w = 512))
      .collect()(0).getLong(0)
    val exact = (1 to 10).map(k => (k % 3 + 1) * 2).sum
    assert(est == exact, s"est $est vs exact $exact")
  }

  test("hllSlidingDistinct: each window's estimate equals the raw slice's hllDistinct") {
    val ev = (1 to 300).map(i =>
      ((i % 37).toLong, ts(f"2024-01-0${1 + i % 3}%d ${i % 24}%02d:00:00")))
      .toDF("user_id", "ts")
    val slideSec = 86400L
    val got = Sketches.hllSlidingDistinct(ev, col("ts"), col("user_id"),
      slideSec, slides = 2, p = 9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (wStart, est) =>
      val slice = ev.filter(col("ts").cast("long") >= wStart &&
        col("ts").cast("long") < wStart + 2 * slideSec)
      val direct = Sketches.hllDistinct(slice, Nil, col("user_id"), p = 9)
        .collect()(0).getDouble(0)
      assert(est == direct, s"window $wStart: $est vs $direct")
    }
  }

  test("centroidDrift: hand-computed L2 and cosine between two slice means") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(3.0f, 0.0f), 0), // mean (2, 0)
      (3L, Array(0.0f, 2.0f), 1), (4L, Array(0.0f, 4.0f), 1)) // mean (0, 3)
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(vecs, "label", "embedding", 0, 1).collect()(0)
    assert(math.abs(r.getDouble(0) - math.sqrt(13.0)) < 1e-6) // |(2,-3)|
    assert(r.getDouble(1) == 0.0) // orthogonal means
  }

  test("mahalanobisOutliers: the planted far vector ranks first") {
    val base = (0L until 30L).map(i =>
      (i, Array.tabulate(4)(j => ((i + j) % 5).toFloat / 10f)))
    val out = (99L, Array.tabulate(4)(_ => 50f)) // far off every dimension
    val got = Similarity.mahalanobisOutliers((base :+ out).toDF("vec_id", "embedding"),
      "embedding", dim = 4, k = 3).collect()
    assert(got.length == 3 && got.minBy(_.getInt(2)).getLong(0) == 99L)
  }

  test("tfIdfSimilarPairs: identical docs hit cosine 1; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val got = TextOps.tfIdfSimilarPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L)) && got((1L, 2L)) == 1.0)
  }

  test("scd2AsOf: the covering version at the instant, open version included") {
    val hist = Seq(
      (1L, "a", 1000L, Some(2000L), false, 1L),
      (1L, "b", 2000L, None, true, 2L))
      .toDF("user_id", "event_type", "valid_from_ms", "valid_to_ms", "is_current", "version")
    def at(t: Long) = EventOps.scd2AsOf(hist, t).collect().map(_.getString(1)).toSeq
    assert(at(1500L) == Seq("a") && at(2000L) == Seq("b") && at(999L).isEmpty)
  }

  test("histogram: hand-computed buckets, max clamped, constant group collapses to one") {
    val rows = Seq(("a", 0.0), ("a", 5.0), ("a", 10.0), ("a", 9.999),
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val got = EventOps.histogram(rows, Seq("g"), col("v"), buckets = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(4)).toMap
    // a: width 1 -> 0.0 in bucket 0, 5.0 in bucket 5, 9.999 and 10.0 (clamped) in 9
    assert(got == Map(("a", 0) -> 1L, ("a", 5) -> 1L, ("a", 9) -> 2L, ("b", 0) -> 2L))
  }

  test("pmiPairs: always-together tokens outrank independent ones") {
    // 'x y' co-occur in every doc they appear in; 'x z' only half the time
    val docs = (1 to 12).map { i =>
      val t = if (i <= 6) "x y z" else if (i <= 9) "z q" else "q r"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val got = TextOps.pmiPairs(docs, "doc_id", "text", minDf = 2, maxDf = 12, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // df(x)=df(y)=6, df(x,y)=6, N=12 -> pmi = ln(6*12/36) = ln 2
    assert(math.abs(got(("x", "y")) - math.log(2)) < 1e-6)
    // x-z co-occur 6, df(z)=9 -> pmi = ln(6*12/54) < ln 2
    assert(got(("x", "y")) > got(("x", "z")))
  }

  test("zipfFit: an exact power-law corpus recovers slope -1, intercept ln(K)") {
    // counts = 60/rank exactly: ln f = ln 60 - 1·ln rank
    val words = Seq(("a", 60), ("b", 30), ("c", 20), ("d", 15), ("e", 12))
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val got = TextOps.zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text",
      vocabSize = 5).collect()(0)
    assert(got.getLong(0) == 5L)
    assert(math.abs(got.getDouble(1) + 1.0) < 1e-4, s"slope ${got.getDouble(1)}")
    assert(math.abs(got.getDouble(2) - math.log(60.0)) < 1e-4)
  }

  test("ev_peaks shape: strict local maxima only, plateaus and edges excluded") {
    import org.apache.spark.sql.expressions.Window
    // daily series: 1 3 2 5 5 4 -> only day2 (3) is a strict peak
    val days = Seq(1 -> 1, 2 -> 3, 3 -> 2, 4 -> 5, 5 -> 5, 6 -> 4)
    val d = days.map { case (day, n) => (f"2024-01-0$day%d", n.toLong) }
      .toDF("day", "n").select(to_date(col("day")).as("day"), col("n"))
    val w = Window.orderBy("day")
    val peaks = d.select(col("day"), col("n"),
        lag(col("n"), 1).over(w).as("p"), lead(col("n"), 1).over(w).as("x"))
      .filter(col("p").isNotNull && col("x").isNotNull &&
        col("n") > col("p") && col("n") > col("x"))
      .collect().map(_.getDate(0).toString)
    assert(peaks.toSeq == Seq("2024-01-02"))
  }

  test("argument contracts fail loudly, not silently") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "g", "v")
    intercept[IllegalArgumentException](
      EventOps.ewma(df, Seq("g"), Seq(col("id")), col("v"), lookback = 0))
    intercept[IllegalArgumentException](
      EventOps.bootstrapMeans(df, "id", col("v"), replicates = 1))
    intercept[IllegalArgumentException](
      EventOps.histogram(df, Seq("g"), col("v"), buckets = 0))
    intercept[IllegalArgumentException](
      EventOps.decayedCounts(df.withColumn("ts", current_timestamp()),
        Seq("g"), "ts", halfLifeSec = 0))
    intercept[IllegalArgumentException](
      Similarity.ivfPqKnn(df.toDF("vec_id", "g", "v"), df.toDF("vec_id", "g", "v"),
        k = 1, dim = 7, m = 4)) // dim must split into m subspaces
    intercept[IllegalArgumentException](
      graft.sketch.Sketches.hllSlidingDistinct(df.withColumn("ts", current_timestamp()),
        col("ts"), col("id"), slideSec = 0, slides = 4, p = 9))
  }

  test("profileSketch: exact cheap stats match profile(); NDV estimate is sane") {
    val df = spark.read.parquet(s"$SF/documents.parquet")
    val cols = Seq("doc_id", "lang")
    val exact = graft.sources.Profiler.profile(df, cols).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.sources.Profiler.profileSketch(df, cols, p = 12).collect().foreach { r =>
      val (nRows, nNulls, nd) = exact(r.getString(0))
      assert(r.getLong(1) == nRows && r.getLong(2) == nNulls)
      val est = r.getDouble(3)
      assert(est > nd * 0.8 && est < nd * 1.2, s"${r.getString(0)}: $est vs $nd")
    }
  }
}
