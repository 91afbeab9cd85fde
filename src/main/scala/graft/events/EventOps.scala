package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal operators over event streams (batch forms; streaming variants in
 * graft.streaming). No reference analogue — the reference's only temporal
 * aspect is its insert-time stats fibers; these are the standard
 * event-pipeline operators a Spark engine is expected to ship.
 */
object EventOps {

  /**
   * As-of join: for each left row, the nearest right row with the same key —
   * backward (latest rightTime ≤ leftTime, the default) or `forward`
   * (earliest rightTime ≥ leftTime), optionally bounded by
   * `toleranceMillis` (a match farther than the tolerance yields null, the
   * pandas merge_asof contract).
   *
   * Implemented as the union-merge trick: tag both sides, sort within key by
   * time (reversed for forward), and carry the last-seen right row with a
   * running window — one shuffle by key, no range cross-join, skew-safe
   * under AQE. This is the scalable shape for 100 TB (a per-key sort-merge,
   * same cost class as a sort-merge join); tolerance is a post-mask, not a
   * range join.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightCols: Seq[String], forward: Boolean = false,
               toleranceMillis: Option[Long] = None): DataFrame = {
    val lp = left.columns.filterNot(c => c == key || c == time)
    val carryCols = rightCols :+ time // right timestamp rides along for the tolerance mask
    val l = left.select(
      Seq(col(key), col(time)) ++ lp.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(null).cast(right.schema(time).dataType).as(s"__r_$time") :+
        lit(1).as("__side"): _*)
    val r = right.select(
      Seq(col(key), col(time)) ++
        lp.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")) :+
        col(time).as(s"__r_$time") :+
        lit(0).as("__side"): _*)
    // right rows sort before left rows at the same timestamp (side 0 < 1):
    // an exactly-simultaneous right row IS visible to the left row, in
    // either direction (≤ / ≥ are both inclusive).
    val ord = if (forward) col(time).desc else col(time).asc
    val w = Window.partitionBy(key).orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__last_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val withinTol = toleranceMillis match {
      case Some(tol) =>
        abs(unix_millis(col(time)) - unix_millis(col(s"__last_$time"))) <= tol
      case None => lit(true)
    }
    carried.filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++ lp.map(col) ++
        rightCols.map(c => when(withinTol, col(s"__last_$c")).as(s"asof_$c")): _*)
  }

  /**
   * Time-range join: every (left, right) pair sharing `key` whose
   * timestamps differ by at most `deltaMillis`. The naive form is an
   * inequality theta-join — a per-key cross product that explodes on hot
   * keys. This is the binned decomposition instead: each side buckets its
   * timestamp into delta-width bins; any qualifying pair's bins differ by
   * at most 1, so the LEFT side expands to its bin and both neighbors
   * (a fixed 3× of one side, not |L|·|R|) and the join becomes an
   * EQUI-join on (key, bin) with the exact |Δt| ≤ delta post-filter.
   * Each right row owns exactly one bin and the three probed bins are
   * distinct, so no pair is emitted twice — no dedup pass.
   *
   * At 100 TB this is a plain shuffled (or AQE-skew-split) hash join whose
   * fan-out is bounded by real temporal co-occurrence, never the full
   * per-key history square. Timestamps are epoch-positive by contract
   * (long floor-division buckets; pre-1970 data would need floor, not
   * truncate-toward-zero).
   *
   * @return left row (key, leftTime, left payload…) ++ rightCols renamed
   *         `r_<col>` ++ `r_<rightTime>`
   */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String, deltaMillis: Long,
                rightCols: Seq[String]): DataFrame = {
    require(deltaMillis > 0, s"deltaMillis must be > 0, got $deltaMillis")
    val lp = left.columns.filterNot(_ == key)
    val l = left.select(col(key) +: lp.map(col): _*)
      .withColumn("__bin0", floor(unix_millis(col(leftTime)) / deltaMillis).cast("long"))
      .withColumn("__bin", explode(array(col("__bin0") - 1, col("__bin0"), col("__bin0") + 1)))
      .drop("__bin0")
    val r = right.select(col(key) +:
        (rightCols.map(c => col(c).as(s"r_$c")) :+ col(rightTime).as(s"r_$rightTime")): _*)
      .withColumn("__bin", floor(unix_millis(col(s"r_$rightTime")) / deltaMillis).cast("long"))
    l.join(r, Seq(key, "__bin"))
      .filter(abs(unix_millis(col(leftTime)) - unix_millis(col(s"r_$rightTime"))) <= deltaMillis)
      .drop("__bin")
  }

  /**
   * Ordered funnel analysis: the furthest stage each key reached walking
   * `steps` in order — stage i counts only if an event of step i occurred
   * STRICTLY AFTER the time stage i−1 was first reached (the standard
   * product-analytics funnel contract; simultaneous events don't advance).
   *
   * One filtered min-aggregation per step (k passes for a k-step funnel,
   * k is small and static), each a combinable groupBy joined back on the
   * key — no window over the whole event history, no per-key sort. Keys
   * that never reached step 1 report stage 0.
   *
   * @return (key, stage INT, step_1_ts .. step_k_ts TIMESTAMP nullable)
   */
  def funnel(events: DataFrame, key: String, time: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val keys = events.select(col(key)).distinct()
    // fold: stage times accumulate as columns __t1..__tk
    val staged = steps.zipWithIndex.foldLeft(keys) { case (acc, (step, i)) =>
      val prev = if (i == 0) None else Some(s"__t$i")
      val hits = prev match {
        case None =>
          events.filter(col(typeCol) === step)
            .groupBy(col(key)).agg(min(col(time)).as(s"__t${i + 1}"))
        case Some(pcol) =>
          events.filter(col(typeCol) === step)
            .join(acc.select(col(key), col(pcol)), Seq(key))
            .filter(col(time) > col(pcol))
            .groupBy(col(key)).agg(min(col(time)).as(s"__t${i + 1}"))
      }
      acc.join(hits, Seq(key), "left")
    }
    // fold ascending so the HIGHEST reached stage's check ends up outermost
    val stage = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"__t${i + 1}").isNotNull, lit(i + 1)).otherwise(els)
    }
    staged.select(
      col(key) +: stage.as("stage") +:
        steps.indices.map(i => col(s"__t${i + 1}").as(s"step${i + 1}_ts")): _*)
  }

  /**
   * Cohort retention: users grouped by first-activity day, the count and
   * fraction still active k days later — the standard growth-analytics
   * rollup. Three combinable aggregations (first-activity per user, distinct
   * active days per user, cohort sizes) and one broadcastable join; nothing
   * is per-event after the first distinct, so the shape is user-bounded
   * regardless of event volume.
   *
   * @return (cohort DATE, k INT days since cohort, n_active BIGINT,
   *         retention DOUBLE rounded to 6) ordered semantics-free
   */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val first = events.groupBy(col(userCol)).agg(min(day).as("cohort"))
    val activeDays = events.select(col(userCol), day.as("p")).distinct()
    val act = activeDays.join(first, Seq(userCol))
      .select(col("cohort"), datediff(col("p"), col("cohort")).as("k"))
      .groupBy("cohort", "k").agg(count(lit(1)).as("n_active"))
    // cohort size ≡ the k=0 row (a user's first-activity day is by
    // definition an active day), so sizes derive from `act` itself — no
    // third pass over the event table
    val sizes = act.filter(col("k") === 0)
      .select(col("cohort"), col("n_active").as("n_users"))
    act.join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("k"), col("n_active"),
        round(col("n_active") / col("n_users"), 6).as("retention"))
  }

  /**
   * Gap-based sessionization: a new session starts when the gap to the
   * previous event of the same key exceeds `gapSeconds`.
   * @return input rows + session_id (per-key ordinal, 1-based)
   */
  def sessionize(events: DataFrame, key: String, time: String, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(col(time))
    events
      .withColumn("__prev", lag(col(time), 1).over(byKey))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_timestamp(col(time)) - unix_timestamp(col("__prev")) > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }
}
