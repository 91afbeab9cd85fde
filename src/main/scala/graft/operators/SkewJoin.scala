package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-aware inner equi-join: heavy-hitter detection + salted replication.
 *
 * At 100 TB one hot key (a celebrity vertex, an empty-string default, a null
 * surrogate) puts an entire shuffle partition on one task and turns a
 * 1000-executor join into a single-straggler job. AQE's skew-join split
 * (`spark.sql.adaptive.skewJoin.enabled`) already mitigates sort-merge skew
 * at runtime; this operator is the complementary STATIC device for the cases
 * AQE cannot touch — shuffled-hash joins, skew that AQE's partition-size
 * heuristic misses, and pipelines where the split must be deterministic.
 *
 * Shape (all distributed, nothing driver-side):
 *   1. one exact, map-side-combinable count over the probe side's join
 *      column finds keys with ≥ `hotThreshold` rows — by definition few,
 *      so the hot-key set broadcasts;
 *   2. the probe splits into cold and hot streams (broadcast anti/semi
 *      joins — no shuffle);
 *   3. the cold stream joins normally;
 *   4. the hot stream's BUILD rows are replicated `salts`× (bounded:
 *      hot keys × salts) while each probe row picks one salt from a
 *      deterministic hash of its entire row, so each hot key's rows spread
 *      over `salts` shuffle partitions instead of one;
 *   5. union. Result ≡ the plain inner equi-join, row for row (duplicate
 *      multiplicities included) — pinned by the DuckDB oracle and
 *      SkewJoinSpec's exceptAll-both-ways property.
 *
 * The salt is a hash of the probe row CONTENT mixed with the row's
 * monotonic id: content alone left a hot key whose rows are identical on
 * ONE salt (the straggler survives); the id guarantees spread. Salt values
 * are therefore partition-layout-dependent — the JOIN RESULT is not (the
 * salt only routes rows and is dropped), which is what the oracle compares.
 *
 * [[saltedJoin]] is a BATCH operator: a stream-stream join keys its state
 * by the join columns, so a salt that changes between micro-batches /
 * restarts ([[org.apache.spark.sql.functions.monotonically_increasing_id]]
 * is partition-layout-dependent by design) would silently mis-key state.
 * Stream users take [[saltedJoinStable]] / [[saltedJoinWithHotKeys]]: the
 * salt there hashes row content mixed with a CALLER-SUPPLIED tiebreak
 * column (an event id, offset, or timestamp — the contract a stream can
 * honor), so the same row salts identically in every run and restart;
 * stream-stream parity with the batch join is pinned by SkewJoinSpec's
 * MemoryStream test.
 */
object SkewJoin {

  /**
   * @param probe        large, possibly skewed side (streamed)
   * @param build        smaller side (replicated for hot keys)
   * @param probeKey     equi-join column on `probe`
   * @param buildKey     equi-join column on `build`
   * @param salts        fan-out factor for hot keys (≈ executor parallelism)
   * @param hotThreshold a key is "hot" at ≥ this many probe rows
   * @return inner-join result with `probe.columns ++ build.columns`
   */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, salts: Int, hotThreshold: Long): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    val saltCol = "__graft_salt"
    // case-insensitive (Spark's default resolution) and covering BOTH
    // injected names — a pre-existing __hot_key would make the anti/semi
    // conditions ambiguous
    for (reserved <- Seq(saltCol, "__hot_key");
         side <- Seq(probe, build))
      require(!side.columns.exists(_.equalsIgnoreCase(reserved)),
        s"column name $reserved is reserved by SkewJoin")
    // duplicate names across sides would break the final unionByName (and
    // make the output contract ambiguous anyway) — fail fast with a clear
    // message instead of a deep analysis error
    val shared = probe.columns.map(_.toLowerCase)
      .intersect(build.columns.map(_.toLowerCase))
    require(shared.isEmpty || (probeKey == buildKey && shared.sameElements(Seq(probeKey.toLowerCase))),
      s"probe and build share column names ${shared.mkString(", ")} — rename before joining")

    val hot = probe.groupBy(col(probeKey)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= hotThreshold)
      .select(col(probeKey).as("__hot_key"))

    val coldJoined0 = probe.as("cp")
      .join(broadcast(hot), col(probeKey) === col("__hot_key"), "left_anti")
      .join(build.as("cb"), col(s"cp.$probeKey") === col(s"cb.$buildKey"))
    // same-named keys keep ONE copy (the probe's) — equal by the join
    // predicate, and unionByName/downstream by-name refs need uniqueness
    val coldJoined = if (probeKey == buildKey)
      coldJoined0.drop(col(s"cb.$buildKey")) else coldJoined0

    val probeHot = probe
      .join(broadcast(hot), col(probeKey) === col("__hot_key"), "left_semi")
      // monotonically_increasing_id mixed in: a hot key whose rows are
      // IDENTICAL would otherwise hash to one salt and keep the straggler;
      // the id is partition-dependent but the salt only routes rows — the
      // join RESULT stays exactly the plain join either way
      .withColumn(saltCol, pmod(
        xxhash64(graft.util.ContentSalt(probe, salts), monotonically_increasing_id()),
        lit(salts)))
    val buildHot = build
      .join(broadcast(hot), col(buildKey) === col("__hot_key"), "left_semi")
      .withColumn(saltCol, explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    val hotJoined0 = probeHot.as("p")
      .join(buildHot.as("b"),
        col(s"p.$probeKey") === col(s"b.$buildKey") &&
          col(s"p.$saltCol") === col(s"b.$saltCol"))
      .drop(saltCol)
    val hotJoined = if (probeKey == buildKey)
      hotJoined0.drop(col(s"b.$buildKey")) else hotJoined0

    coldJoined.unionByName(hotJoined)
  }

  /**
   * Run-stable variant of [[saltedJoin]]: identical semantics, but the
   * hot-probe salt hashes row content mixed with the caller-supplied
   * `tiebreakCol` instead of the monotonic row id — the same row maps to
   * the same salt in every run, restart, and micro-batch. The tiebreak
   * should be (near-)unique per row among rows sharing a hot key (an event
   * id, a source offset, a timestamp); a constant tiebreak degrades to
   * content-only salting (identical hot rows collapse onto one salt — the
   * batch variant's documented straggler case), never to wrong results.
   *
   * Batch entry point — computes the hot-key set itself. Streams cannot
   * (a streaming aggregate cannot feed a stream-stream join), so stream
   * users pre-compute hot keys (yesterday's profile, known null/default
   * surrogates) and call [[saltedJoinWithHotKeys]] directly.
   */
  def saltedJoinStable(probe: DataFrame, build: DataFrame, probeKey: String,
                       buildKey: String, salts: Int, hotThreshold: Long,
                       tiebreakCol: String): DataFrame = {
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    val hot = probe.groupBy(col(probeKey)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= hotThreshold)
      .select(col(probeKey).as("__hot_key"))
    saltedJoinWithHotKeys(probe, build, probeKey, buildKey, salts, hot, tiebreakCol)
  }

  /**
   * Salted inner equi-join against an EXPLICIT hot-key set, with a
   * run-stable content+tiebreak salt. Works on streaming DataFrames:
   * the hot-key set must be a small STATIC frame (broadcast against both
   * streams — stream-static joins are stateless), the cold path is a plain
   * stream-stream equi-join, and the hot path joins on (key, salt) where
   * the salt is a pure function of row data — stable across micro-batches
   * and restarts, so state keying is correct. Result ≡ the plain inner
   * equi-join restricted to this hot-key split (row for row, duplicates
   * included); parity with the batch join is pinned in SkewJoinSpec.
   *
   * @param hotKeys single-column static frame of keys to salt (its one
   *                column is taken as the key regardless of name)
   * @param tiebreakCol probe column mixed into the salt for spread;
   *                    must exist on the probe side
   */
  def saltedJoinWithHotKeys(probe: DataFrame, build: DataFrame, probeKey: String,
                            buildKey: String, salts: Int, hotKeys: DataFrame,
                            tiebreakCol: String): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(hotKeys.columns.length == 1,
      s"hotKeys must have exactly one column, got ${hotKeys.columns.mkString(", ")}")
    require(!hotKeys.isStreaming, "hotKeys must be a static frame (it broadcasts)")
    require(probe.columns.exists(_.equalsIgnoreCase(tiebreakCol)),
      s"tiebreak column $tiebreakCol not found on the probe side")
    val saltCol = "__graft_salt"
    for (reserved <- Seq(saltCol, "__hot_key");
         side <- Seq(probe, build))
      require(!side.columns.exists(_.equalsIgnoreCase(reserved)),
        s"column name $reserved is reserved by SkewJoin")
    val shared = probe.columns.map(_.toLowerCase)
      .intersect(build.columns.map(_.toLowerCase))
    require(shared.isEmpty || (probeKey == buildKey && shared.sameElements(Seq(probeKey.toLowerCase))),
      s"probe and build share column names ${shared.mkString(", ")} — rename before joining")

    // distinct: the left_outer mark join (unlike the batch path's anti/semi
    // pair) would REPLICATE rows per duplicate hot key — and a caller-built
    // hot list (yesterday's profile) can easily carry dups
    val hot = broadcast(hotKeys.select(col(s"`${hotKeys.columns.head}`").as("__hot_key")).distinct())
    // one stateless stream-static left_outer marks hot rows; filter + drop
    // replaces the batch path's anti/semi pair (anti is not in the
    // stream-static support matrix, and one join beats two anyway)
    def markHot(side: DataFrame, key: String): DataFrame =
      side.join(hot, col(key) === col("__hot_key"), "left_outer")
    val probeMarked = markHot(probe, probeKey)
    val buildMarked = markHot(build, buildKey)

    val coldJoined0 = probeMarked.filter(col("__hot_key").isNull).drop("__hot_key").as("cp")
      .join(buildMarked.filter(col("__hot_key").isNull).drop("__hot_key").as("cb"),
        col(s"cp.$probeKey") === col(s"cb.$buildKey"))
    val coldJoined = if (probeKey == buildKey)
      coldJoined0.drop(col(s"cb.$buildKey")) else coldJoined0

    val probeHot = probeMarked.filter(col("__hot_key").isNotNull).drop("__hot_key")
      .withColumn(saltCol, pmod(
        xxhash64(graft.util.ContentSalt(probe, salts), col(s"`$tiebreakCol`")),
        lit(salts)))
    val buildHot = buildMarked.filter(col("__hot_key").isNotNull).drop("__hot_key")
      .withColumn(saltCol, explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    val hotJoined0 = probeHot.as("p")
      .join(buildHot.as("b"),
        col(s"p.$probeKey") === col(s"b.$buildKey") &&
          col(s"p.$saltCol") === col(s"b.$saltCol"))
      .drop(saltCol)
    val hotJoined = if (probeKey == buildKey)
      hotJoined0.drop(col(s"b.$buildKey")) else hotJoined0

    coldJoined.unionByName(hotJoined)
  }
}
