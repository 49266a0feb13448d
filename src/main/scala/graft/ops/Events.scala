package graft.ops

import graft.Tables
import graft.util.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Events / time-series suite (events table).
  *
  * Time axis: integer epoch-microseconds. Spark reads the parquet
  * TIMESTAMP(NANOS) column as BIGINT ns (`nanosAsLong`) and floors to µs
  * (`ts div 1000`); DuckDB's parquet reader truncates ns→µs at read, so
  * `epoch_us(ts)` is the identical integer — all window/gap/funnel math
  * is exact integer arithmetic on both engines.
  *
  * Scale posture: tumbling windows and sessionization shuffle once on
  * their natural key (event_type×hour, user); funnel stages are
  * per-user aggregates with map-side combine. No driver-side loops.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private final val HourUs = 3600L * 1000000L
  private final val GapUs = 30L * 60L * 1000000L // 30-min session gap
  private final val UsPerDay = 86400L * 1000000L

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), idiv(col("ts"), 1000L).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))

  // ── ev_window_agg — tumbling 1-hour windows per event type ───────────
  def evWindowAgg: Q = (spark, dir) => {
    ev(spark, dir)
      .groupBy(col("event_type"), idiv(col("ts_us"), HourUs).as("hour_idx"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy("event_type", "hour_idx")
  }
  val evWindowAggSql = s"""
    SELECT event_type, epoch_us(ts) // $HourUs AS hour_idx,
      COUNT(*) AS n, CAST(SUM(${centsSql("value")}) AS BIGINT) AS sum_value_c
    FROM events GROUP BY 1, 2 ORDER BY event_type, hour_idx"""

  // ── ev_sessionize — 30-min-gap sessions per user ─────────────────────
  /** Unordered per-user session aggregate shared by [[evSessionize]] and
    * the streaming twin ([[graft.streaming.Streaming.sessionizeClosedBatch]]):
    * lag → gap flag → running sum = session index; one shuffle on user_id
    * serves both windows and the final per-session aggregate. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev(spark, dir)
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        sum(cents(col("value"))).as("sum_value_c"))
  }

  def evSessionize: Q = (spark, dir) =>
    sessions(spark, dir).orderBy("user_id", "sid")
  val evSessionizeSql = s"""
    WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events),
    flagged AS (SELECT user_id, event_id, ts_us, value,
        CASE WHEN lag(ts_us) OVER w IS NULL
               OR ts_us - lag(ts_us) OVER w > $GapUs THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sess AS (SELECT user_id, ts_us, value,
        -- BIGINT cast: DuckDB window SUM(int) is HUGEINT, which the
        -- driver's pandas hasher renders float64 vs Spark's int64.
        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      FROM flagged)
    SELECT user_id, sid, COUNT(*) AS n_events,
      MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
      CAST(SUM(${centsSql("value")}) AS BIGINT) AS sum_value_c
    FROM sess GROUP BY 1, 2 ORDER BY user_id, sid"""

  // ── ev_funnel — ordered view→click→purchase funnel per user ──────────
  /** Stage k timestamp = first stage-k event strictly after stage k−1.
    * Three per-user aggregates chained by broadcast-able user-level
    * results — no window over the full event stream. */
  def evFunnel: Q = (spark, dir) => {
    val e = ev(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") > col("t_view"))
      .groupBy("user_id").agg(min("ts_us").as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") > col("t_click"))
      .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
    v.join(c.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L).otherwise(1L).as("stage"))
      .orderBy("user_id")
  }
  val evFunnelSql = """
    WITH e AS (SELECT epoch_us(ts) AS ts_us, user_id, event_type FROM events),
    v AS (SELECT user_id, MIN(ts_us) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(ts_us) AS t_click FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
    p AS (SELECT e.user_id, MIN(ts_us) AS t_purchase FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
    SELECT v.user_id, t_view, t_click, t_purchase,
      CASE WHEN t_purchase IS NOT NULL THEN 3
           WHEN t_click IS NOT NULL THEN 2 ELSE 1 END AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id"""

  // ── ev_asof_join — most recent prior click for every purchase ────────
  /** AS-OF join (an operator Spark lacks natively) composed from
    * built-ins: union both sides tagged, one window sorted by
    * (ts, side, id), running max of the left side's timestamp = the
    * as-of match. ONE shuffle on the join key, no inequality join, no
    * BNL — this is the shape that survives 100 TB (vs. the naive
    * `a.ts <= b.ts` theta-join, which cannot hash-partition). */
  def evAsofJoin: Q = (spark, dir) => {
    val e = ev(spark, dir).filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        when(col("event_type") === "click", 0L).otherwise(1L).as("kind"))
    val w = Window.partitionBy("user_id")
      .orderBy("ts_us", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_click_us", max(when(col("kind") === 0L, col("ts_us"))).over(w))
      .filter(col("kind") === 1L)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_click_us"))
      .orderBy("event_id")
  }
  val evAsofJoinSql = """
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
      FROM events WHERE event_type IN ('click', 'purchase')),
    m AS (
      SELECT event_id, user_id, ts_us, kind,
        MAX(CASE WHEN kind = 0 THEN ts_us END) OVER (
          PARTITION BY user_id ORDER BY ts_us, kind, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      FROM e)
    SELECT event_id, user_id, ts_us, last_click_us
    FROM m WHERE kind = 1 ORDER BY event_id"""

  // ── ev_range_join — errors near purchases, bucketed interval join ────
  /** Range join (interval containment) via time-bucket blocking: each
    * error emits its hour bucket, each purchase probes its own and the
    * next bucket, so every |Δt| ≤ 1 h pair co-locates on a hash key.
    * Equivalent to the `BETWEEN` theta-join but hash-partitionable —
    * the 100 TB answer to Spark's BNL fallback on inequality joins. */
  def evRangeJoin: Q = (spark, dir) => {
    val e = ev(spark, dir)
    val errs = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts_us").as("err_us"), idiv(col("ts_us"), HourUs).as("bk"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_us").as("p_us"),
        explode(array(idiv(col("ts_us"), HourUs) - 1, idiv(col("ts_us"), HourUs))).as("bk"))
    errs.join(purch, Seq("user_id", "bk"))
      .filter(col("err_us") >= col("p_us") - HourUs && col("err_us") <= col("p_us"))
      .select(col("user_id"), col("p_id"), col("err_id"), col("p_us"), col("err_us"))
      .distinct()
      .orderBy("p_id", "err_id")
  }
  val evRangeJoinSql = s"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
    SELECT DISTINCT p.user_id, p.event_id AS p_id, x.event_id AS err_id,
      p.ts_us AS p_us, x.ts_us AS err_us
    FROM e p JOIN e x ON p.user_id = x.user_id
    WHERE p.event_type = 'purchase' AND x.event_type = 'error'
      AND x.ts_us BETWEEN p.ts_us - $HourUs AND p.ts_us
    ORDER BY p_id, err_id"""

  // ── ev_skew_agg — hot-key aggregation via two-phase salting ──────────
  /** The events table has a handful of event_type values over the whole
    * corpus — the canonical hot-key shape that pins one reducer per key
    * at 100 TB. [[graft.util.Skew.saltedAgg]] splits each key over 32
    * salts, partially aggregates (map-side combined), then merges the
    * partials: no reducer sees more than ~1/32 of the hottest key. The
    * result is exactly the plain GROUP BY (counts and integer cent sums
    * are associative), which is what the oracle checks. */
  def evSkewAgg: Q = (spark, dir) => {
    // Salt on event_id: deterministic per row, so a partially recomputed
    // map stage re-derives identical salts (see Skew.saltedAgg docs).
    graft.util.Skew.saltedAgg(
      ev(spark, dir).select(col("event_id"), col("event_type"), cents(col("value")).as("vc")),
      Seq(col("event_type")), 32, col("event_id"),
      Seq(count(lit(1)).as("n"), sum("vc").as("s")),
      Seq(sum("n").as("n"), sum("s").as("sum_value_c")))
      .orderBy("event_type")
  }
  val evSkewAggSql = s"""
    SELECT event_type, COUNT(*) AS n,
      CAST(SUM(${centsSql("value")}) AS BIGINT) AS sum_value_c
    FROM events GROUP BY 1 ORDER BY event_type"""

  // ── ev_retention — cohort retention matrix ───────────────────────────
  /** Users cohorted by first-activity day; active-user counts per
    * (cohort_day, day_offset). Two aggregations: per-user first day
    * (map-side combined min), then distinct (cohort, offset, user) →
    * counts. The per-user result re-joins events broadcast-ably at
    * oracle scale and shuffles on user_id at 100 TB. */
  private final val DayUs = 86400L * 1000000L
  def evRetention: Q = (spark, dir) => {
    val e = ev(spark, dir).select(col("user_id"), idiv(col("ts_us"), DayUs).as("day"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(first, "user_id")
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"), col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }
  val evRetentionSql = s"""
    WITH e AS (SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events),
    first AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
    act AS (SELECT DISTINCT cohort_day, day - cohort_day AS day_offset, e.user_id
            FROM e JOIN first ON e.user_id = first.user_id)
    SELECT cohort_day, day_offset, COUNT(*) AS n_users
    FROM act GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""

  // ── ev_transition — event-type transition (Markov) matrix ────────────
  /** Consecutive-event transition counts per user ordered by time — the
    * first-order Markov matrix behavioral models train on. One window
    * (lag) over the per-user ordering, then a map-side-combined count
    * aggregate on the (prev, next) pair: a single shuffle on user_id
    * followed by a tiny |types|² aggregate. At 100 TB the user_id shuffle
    * is the same exchange sessionization already pays; the transition
    * table itself is O(|types|²) — driver-safe however large the corpus. */
  /** Consecutive event-type pairs per user — (user_id, prev_type,
    * next_type). The ONE definition of transition semantics (ordering
    * tie-break, ns→µs axis), shared by [[evTransition]] and
    * [[graft.ops.Graph]]'s edge list so the two can never
    * desynchronize. */
  private[graft] def transitionPairs(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .select(col("user_id"), col("prev_type"), col("event_type").as("next_type"))
  }

  def evTransition: Q = (spark, dir) => {
    transitionPairs(spark, dir)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .orderBy("prev_type", "next_type")
  }
  val evTransitionSql = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    t AS (SELECT user_id, event_type AS next_type,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM e)
    SELECT prev_type, next_type, COUNT(*) AS n,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM t WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY prev_type, next_type"""

  // ── ev_top_paths — top event-type trigram paths (sequence mining) ────
  /** The most common 3-step behavioral paths (p1→p2→p3) across all user
    * sequences — the sequence-mining summary behind funnel discovery and
    * next-event models. Two lags over the SAME per-user window (one
    * shuffle on user_id — Spark plans consecutive lags over one
    * WindowExec), then the count aggregate. Note the communication
    * bound: the count alone would shuffle ≤ |types|³ partials, but
    * `countDistinct(user_id)` makes Spark plan a two-level aggregate
    * whose first exchange keys on (path, user_id) — up to paths×users
    * partial rows (map-side combined). That is the price of the
    * distinct-user column; drop it (as stream_transition's maintainable
    * form does) if the path key space × user count ever dominates. The
    * global top-10 is orderBy+limit — Spark plans TakeOrderedAndProject
    * (per-partition heaps + driver merge of 10 rows), NOT a
    * single-partition global sort; ties broken by path so the cut is
    * deterministic. */
  def evTopPaths: Q = (spark, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("p1", lag("event_type", 2).over(byUser))
      .withColumn("p2", lag("event_type", 1).over(byUser))
      .filter(col("p1").isNotNull)
      .groupBy(col("p1"), col("p2"), col("event_type").as("p3"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
      .limit(10)
  }
  val evTopPathsSql = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    t AS (SELECT user_id, event_type AS p3,
        lag(event_type, 1) OVER w AS p2,
        lag(event_type, 2) OVER w AS p1
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
    SELECT p1, p2, p3, COUNT(*) AS n,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM t WHERE p1 IS NOT NULL
    GROUP BY 1, 2, 3 ORDER BY n DESC, p1, p2, p3 LIMIT 10"""

  // ── ev_user_features — per-user ML feature materialization ───────────
  /** The feature-store shape: one row per user with the behavioral
    * features a ranking/churn model trains on — per-type counts (pivot
    * with an EXPLICIT type list, no distinct-discovery job), totals,
    * distinct active days, value volume (exact cents), and recency.
    * ONE groupBy(user_id) with map-side combine; the countDistinct on
    * days plans the standard two-level aggregate (first exchange keyed
    * on (user, day) — bounded by activity, not events). At 100 TB this
    * is the nightly feature materialization: a single user-keyed shuffle
    * writing |users| rows, the same exchange sessionization pays. */
  final val EvTypes = Seq("click", "error", "purchase", "signup", "view")
  def evUserFeatures: Q = (spark, dir) => {
    val typeCounts = EvTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val aggs = typeCounts ++ Seq(
      count(lit(1)).as("n_events"),
      countDistinct(idiv(col("ts_us"), DayUs)).as("n_days"),
      sum(cents(col("value"))).as("value_c"),
      max("ts_us").as("last_ts_us"))
    ev(spark, dir).groupBy("user_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("user_id")
  }
  val evUserFeaturesSql: String = s"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, value FROM events)
    SELECT user_id,
      ${EvTypes.map(t =>
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
        .mkString(",\n      ")},
      COUNT(*) AS n_events,
      CAST(COUNT(DISTINCT ts_us // $DayUs) AS BIGINT) AS n_days,
      CAST(SUM(${centsSql("value")}) AS BIGINT) AS value_c,
      MAX(ts_us) AS last_ts_us
    FROM e GROUP BY user_id ORDER BY user_id"""

  // ── ev_heavy_hitters — Misra-Gries sketch + exact verification ───────
  /** Frequent-key detection via the two-phase sketch-then-verify shape:
    * phase 1 runs the [[graft.functions.MisraGries]] aggregate (O(k)
    * state per partition, map-side merged — NO shuffle of distinct
    * keys) to get ≤ k candidates guaranteed to contain every key with
    * frequency > n/(k+1); phase 2 re-counts ONLY the candidates exactly
    * (broadcast semi-filter, then a ≤ k-key aggregate) and filters on
    * the guarantee threshold — so the final answer is exact and
    * deterministic regardless of the sketch's partition-order-dependent
    * internals, and the oracle is a plain GROUP BY/HAVING. At 100 TB
    * with billions of distinct keys this replaces the full-key shuffle
    * a direct groupBy+HAVING pays with two map-side passes. On this
    * corpus event_type is uniform (~20% each), so with k=9 (threshold
    * n/10) all five types report — the guarantee math, not the corpus,
    * is what the spec exercises (it also plants a skewed synthetic
    * stream and checks candidates ⊇ true heavies). */
  final val MgK = 9
  def evHeavyHitters: Q = (spark, dir) => {
    val keyed = Tables.events(spark, dir)
      .select(col("event_type"), graft.functions.poly_hash(col("event_type")).as("k"))
    // Sketch AND total in ONE aggregate (pass 1 of exactly two corpus
    // passes); the 1-row result is staged so the candidate and total
    // branches don't each re-run the scan. NULL keys are skipped by the
    // aggregate — heavy-hitter detection over a NULLable key column
    // would need a sentinel (the events schema has none).
    val sk = graft.util.Persist.stage(
      keyed.agg(graft.functions.misra_gries(col("k"), MgK).as("cs"),
        count(lit(1)).as("n_total")),
      eager = false)
    val cands = sk.select(explode(col("cs")).as("k"))
    keyed.join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(sk.select(col("n_total"))))
      .filter(col("n_events") * (MgK + 1) > col("n_total"))
      .select(col("event_type"), col("n_events"), col("n_total"))
      .orderBy("event_type")
  }
  val evHeavyHittersSql = s"""
    WITH t AS (SELECT COUNT(*) AS n_total FROM events)
    SELECT event_type, COUNT(*) AS n_events, (SELECT n_total FROM t) AS n_total
    FROM events GROUP BY 1
    HAVING COUNT(*) * ${MgK + 1} > (SELECT n_total FROM t)
    ORDER BY event_type"""

  // ── ev_anomaly — hourly-count outliers, integer-exact z-test ─────────
  /** Volume-anomaly detection over the hourly count series: flag hours
    * whose event count deviates from the type's mean by more than 2
    * standard deviations. The test (c−μ)² > 4σ² is cleared of divisions —
    * (c·n − s)² > 4·(n·ssq − s²) — so every comparison is exact BIGINT
    * arithmetic and the oracle replays it bit-for-bit (no float variance
    * anywhere). Two aggregates: hourly counts (map-side combined), then a
    * |types|-row stats frame broadcast back onto the hourly series. The
    * hourly frame is staged once ([[graft.util.Persist.stage]]) — it
    * feeds both the stats branch and the probe side, and without the
    * materialization Spark would re-scan and re-aggregate the raw events
    * for each branch (the corpus scan is the 100 TB cost; the staged
    * frame is only |types × hours| rows). */
  def evAnomaly: Q = (spark, dir) => {
    val hourly = graft.util.Persist.stage(
      ev(spark, dir)
        .groupBy(col("event_type"), idiv(col("ts_us"), HourUs).as("hour_idx"))
        .agg(count(lit(1)).as("c")),
      eager = false)
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum("c").as("s"), sum(col("c") * col("c")).as("ssq"))
    val dev = col("c") * col("nh") - col("s")
    hourly.join(broadcast(stats), "event_type")
      .filter(dev * dev > lit(4L) * (col("nh") * col("ssq") - col("s") * col("s")))
      .select(col("event_type"), col("hour_idx"), col("c").as("n"),
        (col("c") * col("nh") - col("s")).as("dev_num"))
      .orderBy("event_type", "hour_idx")
  }
  val evAnomalySql = s"""
    WITH hourly AS (SELECT event_type, epoch_us(ts) // $HourUs AS hour_idx, COUNT(*) AS c
                    FROM events GROUP BY 1, 2),
    stats AS (SELECT event_type, COUNT(*) AS nh,
        CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c*c) AS BIGINT) AS ssq
      FROM hourly GROUP BY 1)
    SELECT event_type, hour_idx, c AS n, c*nh - s AS dev_num
    FROM hourly JOIN stats USING (event_type)
    WHERE (c*nh - s)*(c*nh - s) > 4*(nh*ssq - s*s)
    ORDER BY event_type, hour_idx"""

  // ── ev_gap_fill — dense time-spine densification (zero-filled hours) ──
  /** Gap filling: the hourly series per event type densified onto a
    * complete hour spine, missing hours zero-filled — the step before
    * any window/forecast model that assumes equidistant points. The
    * corpus is scanned ONCE into the |types × hours| hourly aggregate
    * (staged); spine bounds, the type list, and the join probe all read
    * the staged frame. The spine itself is generated, not scanned:
    * `sequence(h0, h1)` exploded per type — O(types · hours) rows from a
    * 1-row bounds frame, no shuffle. At 100 TB the spine stays tiny
    * (types × hours is thousands of rows) while the corpus contributes
    * only its one aggregation shuffle. */
  def evGapFill: Q = (spark, dir) => {
    val hourly = graft.util.Persist.stage(
      ev(spark, dir)
        .groupBy(col("event_type"), idiv(col("ts_us"), HourUs).as("hour_idx"))
        .agg(count(lit(1)).as("n")),
      eager = false)
    val bounds = hourly.agg(min("hour_idx").as("h0"), max("hour_idx").as("h1"))
    val spine = hourly.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour_idx"))
    spine.join(hourly, Seq("event_type", "hour_idx"), "left")
      .select(col("event_type"), col("hour_idx"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "hour_idx")
  }
  val evGapFillSql = s"""
    WITH hourly AS (SELECT event_type, epoch_us(ts) // $HourUs AS hour_idx, COUNT(*) AS n
                    FROM events GROUP BY 1, 2),
    b AS (SELECT MIN(hour_idx) AS h0, MAX(hour_idx) AS h1 FROM hourly),
    spine AS (SELECT t.event_type, unnest(range(b.h0, b.h1 + 1)) AS hour_idx
              FROM (SELECT DISTINCT event_type FROM hourly) t, b)
    SELECT s.event_type, s.hour_idx, CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n
    FROM spine s LEFT JOIN hourly USING (event_type, hour_idx)
    ORDER BY event_type, hour_idx"""

  // ── ev_forecast — integer Holt linear smoothing + next-hour forecast ─
  /** Baseline volume forecast per event type — Holt's linear (double
    * exponential) smoothing over the DENSE zero-filled hourly series
    * (the [[evGapFill]] spine: smoothing assumes equidistant points),
    * α = β = 1/4 as exact rationals:
    *   l' = (n + 3l) div 4,   t' = ((l' − l) + 3t) div 4,
    * forecast = l' + t'. EVERY division is arranged positive — the
    * trend is carried SHIFTED ([[HoltShift]]: t̃ = t + 2^40, so the
    * update numerator (l'−l) + 3t̃ + 2^40 = 4t' + r + 4·2^40 ≥ 0) —
    * because Spark's `div` truncates toward zero while DuckDB's `//`
    * floors; on non-negative numerators they agree exactly, the
    * engine-divergence rule every integer op here follows. The fold is
    * inherently sequential per type, so it runs as ONE ordered array
    * fold (`aggregate` over the sorted per-type series — the
    * [[graft.ops.VectorSearch.vsCentroids]] bit-reproducible-fold
    * technique): the corpus contributes one aggregation shuffle to the
    * |types × hours| hourly frame, and the fold itself touches only
    * that bounded series (≤ tens of thousands of elements per type at
    * any corpus size — hours, not rows). The DuckDB oracle replays the
    * recursion as a RECURSIVE CTE stepping hour_idx — identical
    * arithmetic, one row per (type, hour). Output per type: series
    * length, final level, final trend (can be negative), next-hour
    * forecast = level + trend. */
  final val HoltShift = 1L << 40
  def evForecast: Q = (spark, dir) => {
    val hourly = graft.util.Persist.stage(
      ev(spark, dir)
        .groupBy(col("event_type"), idiv(col("ts_us"), HourUs).as("hour_idx"))
        .agg(count(lit(1)).as("n")),
      eager = false)
    val bounds = hourly.agg(min("hour_idx").as("h0"), max("hour_idx").as("h1"))
    val spine = hourly.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour_idx"))
    val dense = spine.join(hourly, Seq("event_type", "hour_idx"), "left")
      .select(col("event_type"), col("hour_idx"), coalesce(col("n"), lit(0L)).as("n"))
    val series = dense.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("hour_idx"), col("n")))).as("s"),
        count(lit(1)).as("n_hours"))
    val ns = transform(col("s"), x => x.getField("n"))
    val folded = aggregate(ns,
      struct(lit(-1L).as("l"), lit(HoltShift).as("tt")),
      (acc, n) => {
        val l = acc.getField("l"); val tt = acc.getField("tt")
        val lNew = idiv(n + lit(3L) * l, lit(4L))
        when(l === lit(-1L), struct(n.as("l"), lit(HoltShift).as("tt")))
          .otherwise(struct(lNew.as("l"),
            idiv(lNew - l + lit(3L) * tt + lit(HoltShift), lit(4L)).as("tt")))
      })
    series.select(col("event_type"), col("n_hours"),
        folded.getField("l").as("level"),
        (folded.getField("tt") - HoltShift).as("trend"))
      .withColumn("forecast", col("level") + col("trend"))
      .orderBy("event_type")
  }
  val evForecastSql = s"""
    WITH RECURSIVE hourly AS (
      SELECT event_type, epoch_us(ts) // $HourUs AS hour_idx, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    b AS (SELECT MIN(hour_idx) AS h0, MAX(hour_idx) AS h1 FROM hourly),
    spine AS (SELECT t.event_type, unnest(range(b.h0, b.h1 + 1)) AS hour_idx
              FROM (SELECT DISTINCT event_type FROM hourly) t, b),
    dense AS (SELECT s.event_type, s.hour_idx,
        CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n
      FROM spine s LEFT JOIN hourly USING (event_type, hour_idx)),
    f AS (
      SELECT d.event_type, d.hour_idx, d.n AS l, CAST($HoltShift AS BIGINT) AS tt
      FROM dense d, b WHERE d.hour_idx = b.h0
      UNION ALL
      SELECT d.event_type, d.hour_idx,
        (d.n + 3 * f.l) // 4,
        (((d.n + 3 * f.l) // 4) - f.l + 3 * f.tt + $HoltShift) // 4
      FROM f JOIN dense d
        ON d.event_type = f.event_type AND d.hour_idx = f.hour_idx + 1)
    SELECT f.event_type, CAST(b.h1 - b.h0 + 1 AS BIGINT) AS n_hours,
      f.l AS level, f.tt - $HoltShift AS trend,
      f.l + f.tt - $HoltShift AS forecast
    FROM f, b WHERE f.hour_idx = b.h1 ORDER BY event_type"""

  // ── ev_moving_window — RANGE-frame moving 3-hour totals ──────────────
  /** Moving window over the TIME VALUE, not row positions: for each
    * (type, hour) the trailing 3-hour totals via a RANGE frame
    * (`rangeBetween(-2, 0)` on hour_idx) — unlike a ROWS frame this is
    * gap-correct: a missing hour narrows the window instead of silently
    * reaching further back. Computed on the |types × hours| hourly
    * aggregate, so the corpus contributes one aggregation shuffle and
    * the window runs on thousands of rows at any corpus size. Integer
    * sums only (a moving "average" would be mov_sum/mov_n downstream). */
  def evMovingWindow: Q = (spark, dir) => {
    val w = Window.partitionBy("event_type").orderBy("hour_idx")
      .rangeBetween(-2, Window.currentRow)
    ev(spark, dir)
      .groupBy(col("event_type"), idiv(col("ts_us"), HourUs).as("hour_idx"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .withColumn("mov_n", sum("n").over(w))
      .withColumn("mov_sum_c", sum("sum_value_c").over(w))
      .orderBy("event_type", "hour_idx")
  }
  val evMovingWindowSql = s"""
    WITH hourly AS (SELECT event_type, epoch_us(ts) // $HourUs AS hour_idx,
        COUNT(*) AS n, CAST(SUM(${centsSql("value")}) AS BIGINT) AS sum_value_c
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour_idx, n, sum_value_c,
      CAST(SUM(n) OVER w AS BIGINT) AS mov_n,
      CAST(SUM(sum_value_c) OVER w AS BIGINT) AS mov_sum_c
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, hour_idx"""

  // ── ev_histogram — equi-width value histogram per event type ─────────
  /** Distribution profiling: 16 equi-width buckets over the GLOBAL cents
    * range (shared bounds so per-type histograms are comparable), with
    * per-bucket count and observed min/max. Bounds come from a broadcast
    * 1-row aggregate — the two-pass histogram shape (bounds pass +
    * bucket pass) whose second pass is map-side-combined; bucket math is
    * exact integer arithmetic. At 100 TB both passes are single scans
    * with |types × 16|-row shuffles. */
  def evHistogram: Q = (spark, dir) => {
    val e = ev(spark, dir).select(col("event_type"), cents(col("value")).as("v_c"))
    val bounds = e.agg(min("v_c").as("mn"), max("v_c").as("mx"))
    e.crossJoin(broadcast(bounds))
      .withColumn("bucket", idiv((col("v_c") - col("mn")) * 16, col("mx") - col("mn") + 1))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), min("v_c").as("lo_c"), max("v_c").as("hi_c"))
      .orderBy("event_type", "bucket")
  }
  val evHistogramSql = s"""
    WITH e AS (SELECT event_type, ${centsSql("value")} AS v_c FROM events),
    b AS (SELECT MIN(v_c) AS mn, MAX(v_c) AS mx FROM e)
    SELECT event_type, ((v_c - mn) * 16) // (mx - mn + 1) AS bucket,
      COUNT(*) AS n, MIN(v_c) AS lo_c, MAX(v_c) AS hi_c
    FROM e, b GROUP BY 1, 2 ORDER BY event_type, bucket"""

  // ── ev_props_parse — semi-structured JSON property extraction ────────
  /** Event payloads arrive as JSON strings; this is the
    * schema-on-read extraction step every event pipeline starts with.
    * Spark parses with the native `get_json_object` (codegen'd path, no
    * UDF); the extracted integer feeds per-type aggregates. Map-only
    * parse + one map-side-combined aggregate — the 100 TB shape is a
    * projection that never shuffles the raw payloads, only the |types|
    * aggregate rows. The oracle parses the same JSON with DuckDB's
    * json_extract_string. */
  def evPropsParse: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")
  }
  val evPropsParseSql = """
    WITH e AS (SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
    SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_k,
      CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
      CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM e GROUP BY 1 ORDER BY event_type"""

  // ── ev_count_min — Count-Min sketch frequency estimation ─────────────
  /** Count-Min sketch (Cormode & Muthukrishnan 2005) of per-type user
    * frequencies — completes the repo's mergeable-sketch family
    * (Misra-Gries heavy hitters, KMV distinct, HLL distinct): d=3
    * pairwise-independent hash rows × w=256 counters per event type,
    * point estimates for a probe key set as `min` over the d registers.
    * Registers are plain integer COUNTs — duplicate-insensitive to
    * partitioning, mergeable by +, map-side combined; the corpus pass is
    * map-only (explode of d tiny structs), the only shuffle carries
    * |types|·d·w bounded partial registers, and the probe grid is
    * broadcast. The estimate ≥ truth (one-sided CM error) is
    * spec-asserted. All arithmetic BIGINT-exact on both engines. */
  final val CmW = 256L
  final val CmP = 1000000007L
  final val CmHashes: Seq[(Long, Long)] =
    Seq((2654435761L, 1L), (2246822519L, 7L), (3266489917L, 13L))
  final val CmProbeKeys = 10L
  def evCountMin: Q = (spark, dir) => {
    // u is reduced mod CmP BEFORE the multiply: u·a would overflow
    // signed 64-bit for user_id ≳ 3.5e9 (Spark wraps silently, DuckDB
    // errors); (u mod p)·a ≡ u·a (mod p) and stays < 2^63.
    def hashRows(u: Column): Column = array(CmHashes.zipWithIndex.map {
      case ((a, b), i) =>
        struct(lit(i.toLong).as("hi"),
          pmod(pmod(pmod(u, lit(CmP)) * a + b, lit(CmP)), lit(CmW)).as("bkt"))
    }: _*)
    val ev = Tables.events(spark, dir).select("event_type", "user_id")
    val regs = ev
      .select(col("event_type"), explode(hashRows(col("user_id"))).as("h"))
      .select(col("event_type"), col("h.hi").as("hi"), col("h.bkt").as("bkt"))
      .groupBy("event_type", "hi", "bkt").agg(count(lit(1)).as("c"))
    val probes = spark.range(CmProbeKeys).select(col("id").as("user_id"))
      .select(col("user_id"), explode(hashRows(col("user_id"))).as("h"))
      .select(col("user_id"), col("h.hi").as("hi"), col("h.bkt").as("bkt"))
    val grid = ev.select("event_type").distinct().crossJoin(probes)
    val est = grid.join(regs, Seq("event_type", "hi", "bkt"), "left")
      .groupBy("event_type", "user_id")
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
    val tru = ev.filter(col("user_id") < CmProbeKeys)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("tn"))
    est.join(tru, Seq("event_type", "user_id"), "left")
      .select(col("event_type"), col("user_id"), col("est_n"),
        coalesce(col("tn"), lit(0L)).as("true_n"))
      .orderBy("event_type", "user_id")
  }
  val evCountMinSql: String = {
    val hashes = CmHashes.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""
    WITH ev AS (SELECT event_type, user_id FROM events),
    hp AS (SELECT * FROM (VALUES $hashes) AS t(hi, a, b)),
    regs AS (SELECT event_type, hi, (((user_id % $CmP) * a + b) % $CmP) % $CmW AS bkt,
        COUNT(*) AS c
      FROM ev CROSS JOIN hp GROUP BY 1, 2, 3),
    probes AS (SELECT r.user_id, hp.hi,
        (((r.user_id % $CmP) * hp.a + hp.b) % $CmP) % $CmW AS bkt
      FROM range(0, $CmProbeKeys) r(user_id) CROSS JOIN hp),
    grid AS (SELECT e.event_type, p.user_id, p.hi, p.bkt
      FROM (SELECT DISTINCT event_type FROM ev) e CROSS JOIN probes p),
    est AS (SELECT g.event_type, g.user_id,
        CAST(MIN(COALESCE(r.c, 0)) AS BIGINT) AS est_n
      FROM grid g LEFT JOIN regs r
        ON r.event_type = g.event_type AND r.hi = g.hi AND r.bkt = g.bkt
      GROUP BY 1, 2),
    tru AS (SELECT event_type, user_id, COUNT(*) AS tn
      FROM ev WHERE user_id < $CmProbeKeys GROUP BY 1, 2)
    SELECT e.event_type, e.user_id, e.est_n,
      CAST(COALESCE(t.tn, 0) AS BIGINT) AS true_n
    FROM est e LEFT JOIN tru t
      ON t.event_type = e.event_type AND t.user_id = e.user_id
    ORDER BY e.event_type, e.user_id"""
  }

  // ── ev_attribution — last-touch conversion attribution ───────────────
  /** Last-touch marketing attribution: every purchase is credited to the
    * user's most recent STRICTLY-preceding click/view (the
    * carry-forward `last(..., ignoreNulls)` over an exclusive
    * rows-frame); purchases with no preceding touch are 'organic'.
    * Per-channel report: purchase count, distinct converting users,
    * credited revenue in exact cents. One shuffle on user_id serves the
    * carry-forward window; the channel aggregate is |channels| rows.
    * Deterministic: the frame is ordered by (ts_us, event_id) — no tie
    * ambiguity — and revenue sums in integer cents. */
  def evAttribution: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(spark, dir)
      .withColumn("touch",
        last(when(col("event_type").isin("click", "view"), col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("organic")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        sum(cents(col("value"))).as("sum_value_c"))
      .orderBy("channel")
  }
  val evAttributionSql = s"""
    WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      FROM events),
    t AS (SELECT user_id, event_type, value,
        last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
          IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM e)
    SELECT COALESCE(touch, 'organic') AS channel, COUNT(*) AS n_purchases,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(SUM(${centsSql("value")}) AS BIGINT) AS sum_value_c
    FROM t WHERE event_type = 'purchase' GROUP BY 1 ORDER BY channel"""

  // ── ev_quantile_sketch — mergeable fixed-bin quantile estimation ─────
  /** Equi-width-bin quantile sketch: per-type value quantiles estimated
    * from a bounded histogram instead of a global sort — the mergeable
    * two-pass shape (global bounds broadcast, then one map-side-combined
    * (type, bin) COUNT whose shuffle carries ≤ |types|·[[QsBins]] rows)
    * that replaces the full-shuffle exact percentile (q14_median) when
    * rank error of one bin width is acceptable. The estimate for
    * per-mille rank q is the TRUE upper value edge (ceil((b+1)·span/B)−1)
    * of the first bin whose
    * cumulative count reaches ceil(q·n/1000); the containing-bin
    * guarantee 0 ≤ est − exact < bin width is spec-asserted against the
    * exact quantile. All integer arithmetic on cents. */
  final val QsBins = 512L
  final val QsQuantiles: Seq[Long] = Seq(250L, 500L, 750L, 900L, 990L)
  def evQuantileSketch: Q = (spark, dir) => {
    val e = ev(spark, dir).select(col("event_type"), cents(col("value")).as("v_c"))
    val bounds = e.agg(min("v_c").as("mn"), max("v_c").as("mx"))
    val binned = e.crossJoin(broadcast(bounds))
      .withColumn("bin", idiv((col("v_c") - col("mn")) * QsBins, col("mx") - col("mn") + 1))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("c"), first("mn").as("mn"), first("mx").as("mx"))
    val wCum = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
    val qs = QsQuantiles.map(q => s"($q)").mkString(", ")
    val probe = spark.sql(s"SELECT * FROM (VALUES $qs) AS t(q_pm)")
      .select(col("q_pm").cast("long").as("q_pm"))
    cum.join(broadcast(probe),
        col("cum") >= idiv(col("q_pm") * col("n") + 999L, 1000L))
      .groupBy("event_type", "q_pm")
      .agg(min("bin").as("bin"), first("mn").as("mn"), first("mx").as("mx"),
        first("n").as("n"))
      .select(col("event_type"), col("q_pm"),
        (col("mn") + idiv((col("bin") + 1) * (col("mx") - col("mn") + 1)
          + QsBins - 1, QsBins) - 1).as("est_c"),
        col("n"))
      .orderBy("event_type", "q_pm")
  }
  val evQuantileSketchSql: String = {
    val qs = QsQuantiles.mkString(", ")
    s"""
    WITH e AS (SELECT event_type, ${centsSql("value")} AS v_c FROM events),
    b AS (SELECT MIN(v_c) AS mn, MAX(v_c) AS mx FROM e),
    binned AS (SELECT event_type, ((v_c - mn) * $QsBins) // (mx - mn + 1) AS bin,
        COUNT(*) AS c, MAX(mn) AS mn, MAX(mx) AS mx
      FROM e, b GROUP BY 1, 2),
    cum AS (SELECT event_type, bin, mn, mx,
        SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                     ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(c) OVER (PARTITION BY event_type) AS n
      FROM binned),
    probe AS (SELECT unnest(ARRAY[$qs]) AS q_pm)
    SELECT event_type, CAST(q_pm AS BIGINT) AS q_pm,
      CAST(MIN(mn + ((bin + 1) * (mx - mn + 1) + $QsBins - 1) // $QsBins - 1) AS BIGINT) AS est_c,
      CAST(MAX(n) AS BIGINT) AS n
    FROM (SELECT c.*, p.q_pm,
            MIN(bin) OVER (PARTITION BY c.event_type, p.q_pm) AS minbin
          FROM cum c JOIN probe p ON cum >= (q_pm * n + 999) // 1000)
    WHERE bin = minbin
    GROUP BY 1, 2 ORDER BY event_type, q_pm"""
  }

  // ── ev_rfm — recency/frequency/monetary user segmentation ────────────
  /** RFM segmentation over purchase events: per-user recency (days since
    * last purchase, vs the corpus max day), frequency (purchase count)
    * and monetary (exact-cents spend) are each scored 1-4 by FIXED
    * integer break rules (not global quantiles — a global ntile would
    * funnel every user through one window partition; fixed breaks keep
    * the whole op two map-side-combined aggregates plus a 1-row bounds
    * broadcast). Output is the segment report: (r,f,m) → users, spend. */
  def evRfm: Q = (spark, dir) => {
    val p = ev(spark, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), idiv(col("ts_us"), UsPerDay).as("day"),
        cents(col("value")).as("v_c"))
    val maxDay = p.agg(max("day").as("max_day"))
    val perUser = p.groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("freq"), sum("v_c").as("mon_c"))
      .crossJoin(broadcast(maxDay))
      .withColumn("days_since", col("max_day") - col("last_day"))
      .withColumn("r_score",
        when(col("days_since") <= 6, 4L).when(col("days_since") <= 13, 3L)
          .when(col("days_since") <= 20, 2L).otherwise(1L))
      .withColumn("f_score",
        when(col("freq") >= 8, 4L).when(col("freq") >= 4, 3L)
          .when(col("freq") >= 2, 2L).otherwise(1L))
      .withColumn("m_score",
        when(col("mon_c") >= 50000L, 4L).when(col("mon_c") >= 20000L, 3L)
          .when(col("mon_c") >= 5000L, 2L).otherwise(1L))
    perUser.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum("mon_c").as("sum_mon_c"))
      .orderBy("r_score", "f_score", "m_score")
  }
  val evRfmSql: String = s"""
    WITH p AS (SELECT user_id, epoch_us(ts) // $UsPerDay AS day,
        ${centsSql("value")} AS v_c
      FROM events WHERE event_type = 'purchase'),
    b AS (SELECT MAX(day) AS max_day FROM p),
    u AS (SELECT user_id, MAX(day) AS last_day, COUNT(*) AS freq,
        SUM(v_c) AS mon_c FROM p GROUP BY 1),
    scored AS (SELECT
        CASE WHEN max_day - last_day <= 6 THEN 4
             WHEN max_day - last_day <= 13 THEN 3
             WHEN max_day - last_day <= 20 THEN 2 ELSE 1 END AS r_score,
        CASE WHEN freq >= 8 THEN 4 WHEN freq >= 4 THEN 3
             WHEN freq >= 2 THEN 2 ELSE 1 END AS f_score,
        CASE WHEN mon_c >= 50000 THEN 4 WHEN mon_c >= 20000 THEN 3
             WHEN mon_c >= 5000 THEN 2 ELSE 1 END AS m_score,
        mon_c
      FROM u, b)
    SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      CAST(m_score AS BIGINT) AS m_score,
      COUNT(*) AS n_users, CAST(SUM(mon_c) AS BIGINT) AS sum_mon_c
    FROM scored GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score"""

  // ── ev_changepoint — best-split mean-shift detection per type ────────
  /** Offline changepoint detection (single best split by mean shift —
    * the exhaustive form of binary segmentation's first step): the
    * corpus is first reduced to the per-(type, hour) count series (the
    * only full-data pass — map-side combined, bounded by |types|·hours),
    * then every candidate split of each type's series is scored from
    * PREFIX SUMS (one cumulative window over the tiny series, O(n) not
    * O(n²)) as |floor-milli left mean − right mean|; argmax via a
    * per-type window MAX, earliest-hour tie-break. All integer. */
  def evChangepoint: Q = (spark, dir) => {
    val hourly = ev(spark, dir)
      .groupBy(col("event_type"), idiv(col("ts_us"), HourUs).as("hour_idx"))
      .agg(count(lit(1)).as("c"))
    val byHour = Window.partitionBy("event_type").orderBy("hour_idx")
    val cum = hourly
      .withColumn("i", row_number().over(byHour).cast("long"))
      .withColumn("csum", sum("c").over(
        byHour.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("tot", sum("c").over(Window.partitionBy("event_type")))
    val scored = cum.filter(col("i") < col("n"))
      .withColumn("mean_l_milli", idiv(col("csum") * 1000L, col("i")))
      .withColumn("mean_r_milli",
        idiv((col("tot") - col("csum")) * 1000L, col("n") - col("i")))
      .withColumn("score_milli", abs(col("mean_l_milli") - col("mean_r_milli")))
    val best = Window.partitionBy("event_type")
    scored
      .withColumn("best_score", max("score_milli").over(best))
      .filter(col("score_milli") === col("best_score"))
      .groupBy("event_type")
      .agg(min("hour_idx").as("split_hour"), first("best_score").as("score_milli"),
        first("n").as("n_hours"), first("tot").as("n_events"))
      .join(scored.select(col("event_type"), col("hour_idx").as("split_hour"),
        col("mean_l_milli"), col("mean_r_milli")), Seq("event_type", "split_hour"))
      .orderBy("event_type")
  }
  val evChangepointSql: String = s"""
    WITH hourly AS (SELECT event_type, epoch_us(ts) // $HourUs AS hour_idx,
        COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    cum AS (SELECT event_type, hour_idx, c,
        CAST(row_number() OVER w AS BIGINT) AS i,
        CAST(SUM(c) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS csum,
        CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx)),
    scored AS (SELECT *,
        (csum * 1000) // i AS mean_l_milli,
        ((tot - csum) * 1000) // (n - i) AS mean_r_milli,
        abs((csum * 1000) // i - ((tot - csum) * 1000) // (n - i)) AS score_milli
      FROM cum WHERE i < n),
    best AS (SELECT event_type, MIN(hour_idx) AS split_hour
      FROM scored s
      WHERE score_milli = (SELECT MAX(score_milli) FROM scored x
                           WHERE x.event_type = s.event_type)
      GROUP BY 1)
    SELECT s.event_type, b.split_hour,
      CAST(s.score_milli AS BIGINT) AS score_milli, s.n AS n_hours,
      s.tot AS n_events, CAST(s.mean_l_milli AS BIGINT) AS mean_l_milli,
      CAST(s.mean_r_milli AS BIGINT) AS mean_r_milli
    FROM best b JOIN scored s
      ON s.event_type = b.event_type AND s.hour_idx = b.split_hour
    ORDER BY s.event_type"""

  // ── ev_rolling_distinct — 7-day rolling distinct users per type ──────
  final val RollDays = 7L

  /** Rolling COUNT(DISTINCT) — the aggregate a RANGE window cannot
    * express (distinct is not algebraic over sliding frames): solved
    * with the bounded-replication spine pattern. The corpus is first
    * reduced to distinct (type, day, user) rows (the only full-data
    * pass), then each reduced row is replicated to the [[RollDays]]
    * target days it contributes to (explode of a 7-element sequence —
    * bounded fan-out, NOT a range self-join) and one distinct aggregate
    * per (type, target day) finishes. Shuffle carries only the reduced
    * frame ×7. Target days clipped to the observed day span via a 1-row
    * bounds broadcast. */
  def evRollingDistinct: Q = (spark, dir) => {
    val d = ev(spark, dir)
      .select(col("event_type"), idiv(col("ts_us"), UsPerDay).as("day"), col("user_id"))
      .distinct()
    val bounds = d.agg(max("day").as("max_day"))
    d.select(col("event_type"), col("user_id"),
        explode(sequence(col("day"), col("day") + (RollDays - 1L))).as("t_day"))
      .crossJoin(broadcast(bounds))
      .filter(col("t_day") <= col("max_day"))
      .groupBy("event_type", "t_day")
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
      .orderBy("event_type", "t_day")
  }
  val evRollingDistinctSql: String = s"""
    WITH d AS (SELECT DISTINCT event_type, epoch_us(ts) // $UsPerDay AS day,
        user_id FROM events),
    b AS (SELECT MAX(day) AS max_day FROM d),
    rep AS (SELECT event_type, user_id, day + r.range AS t_day
      FROM d, range(0, $RollDays) r),
    clipped AS (SELECT rep.* FROM rep, b WHERE t_day <= max_day)
    SELECT event_type, t_day,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d
    FROM clipped GROUP BY 1, 2 ORDER BY event_type, t_day"""

  // ── ev_sequence_pattern — gap-constrained ordered sequence match ─────
  /** MATCH_RECOGNIZE-style sequential pattern detection (the funnel's
    * stricter cousin — ev_funnel only checks stage ORDER, this enforces
    * per-step time gaps): a conversion is view → first click within
    * [[Seq1Us]] → first purchase within [[Seq2Us]] of that click.
    * First-match semantics are made deterministic by value-based RANGE
    * frames (min over (ts_us, ts_us+gap]) — peer rows at an identical
    * timestamp get the identical frame on both engines, so no
    * row-order tie can diverge. Scale: both lookahead columns come from
    * ONE per-user window shuffle (same partition/order, two frames);
    * the view→click stitch is a keyed equi-join on (user_id, ts_us).
    * No self-join on the raw event table, no cross product. */
  final val Seq1Us = 86400L * 1000000L   // view → click gap (1 day)
  final val Seq2Us = 259200L * 1000000L  // click → purchase gap (3 days)
  def evSequencePattern: Q = (spark, dir) => {
    val e = ev(spark, dir).select("user_id", "ts_us", "event_type")
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    val w1 = byUser.rangeBetween(1L, Seq1Us)
    val w2 = byUser.rangeBetween(1L, Seq2Us)
    val staged = e
      .withColumn("next_click_us",
        min(when(col("event_type") === "click", col("ts_us"))).over(w1))
      .withColumn("next_purchase_us",
        min(when(col("event_type") === "purchase", col("ts_us"))).over(w2))
    val clicks = staged.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("click_us"),
        col("next_purchase_us"))
      .distinct()
    staged.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("next_click_us"))
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("next_click_us") === col("click_us"), "left")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_views"),
        sum(col("next_purchase_us").isNotNull.cast("long")).as("n_conversions"),
        min(when(col("next_purchase_us").isNotNull, col("ts_us"))).as("first_conv_view_us"))
      .filter(col("n_conversions") > 0)
      .orderBy("user_id")
  }
  val evSequencePatternSql: String = s"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
    staged AS (SELECT user_id, ts_us, event_type,
        MIN(CASE WHEN event_type = 'click' THEN ts_us END) OVER
          (PARTITION BY user_id ORDER BY ts_us
           RANGE BETWEEN 1 FOLLOWING AND $Seq1Us FOLLOWING) AS next_click_us,
        MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER
          (PARTITION BY user_id ORDER BY ts_us
           RANGE BETWEEN 1 FOLLOWING AND $Seq2Us FOLLOWING) AS next_purchase_us
      FROM e),
    clicks AS (SELECT DISTINCT user_id, ts_us AS click_us, next_purchase_us
      FROM staged WHERE event_type = 'click'),
    v AS (SELECT s.user_id, s.ts_us, c.next_purchase_us
      FROM staged s LEFT JOIN clicks c
        ON s.user_id = c.user_id AND s.next_click_us = c.click_us
      WHERE s.event_type = 'view')
    SELECT user_id, COUNT(*) AS n_views,
      CAST(SUM(CASE WHEN next_purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_conversions,
      MIN(CASE WHEN next_purchase_us IS NOT NULL THEN ts_us END) AS first_conv_view_us
    FROM v GROUP BY 1 HAVING SUM(CASE WHEN next_purchase_us IS NOT NULL THEN 1 ELSE 0 END) > 0
    ORDER BY user_id"""

  // ── ev_bot_detect — inter-arrival cadence regularity screen ──────────
  /** Bot/automation screen over per-user event cadence — the filter a
    * training pipeline runs before learning from user-generated events:
    * humans are bursty (inter-arrival cv² near 1 for Poisson-ish
    * activity), schedulers and scrapers tick (cv² near 0). Per user with
    * ≥ [[BotMinGaps]] gaps: consecutive inter-arrival gaps in integer
    * SECONDS (lag over the per-user time order — the same single user_id
    * shuffle as [[evSessionize]]), then the squared coefficient of
    * variation in integer ppm, cv2_ppm = ⌊10⁶·(n·Σd² − (Σd)²)/(Σd)²⌋,
    * flagged below [[BotCv2FloorPpm]]. Gaps are clamped to
    * [[BotGapCapS]] (10 min): cadence regularity is a WITHIN-activity
    * property — an overnight pause says nothing about tick discipline —
    * and the clamp bounds the arithmetic: d ≤ 600 ⇒ Σd² ≤ n·3.6·10⁵ and
    * (Σd)² ≤ n²·3.6·10⁵. The ppm scaling overflows 2⁶³ (10⁶·N can reach
    * 10²¹), so the ⌊10⁶·N/D⌋ runs as ONE exact integral division in
    * DECIMAL(38,0): 10⁶·N ≤ 3.6·10¹¹·n² stays inside 10³⁸ up to
    * n ≈ 10¹³ gaps per user — a whale holding 1% of a 10¹⁴-event corpus
    * is still exact, and no intermediate can hit ANSI
    * ARITHMETIC_OVERFLOW (the r9 ladder's r·10³ steps capped out at
    * ~1.6·10⁵ gaps). The divisor is `greatest(D, 1)` so the Σd = 0
    * branch is division-safe even if a common-subexpression hoist
    * defeats CASE laziness under `spark.sql.ansi.enabled`. All values
    * non-negative (Cauchy–Schwarz), so Spark decimal `div` ≡ DuckDB
    * HUGEINT `//` and the oracle replays identical integers. Scale: one
    * user_id shuffle + map-side-combined per-user counters (3 longs of
    * state — a hot user costs bandwidth, not memory). */
  final val BotMinGaps = 20L
  final val BotCv2FloorPpm = 100000L
  final val BotGapCapS = 600L
  def evBotDetect: Q = (spark, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val g = ev(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      // clamp AFTER the null filter: least() skips nulls on both engines,
      // so clamping first would turn each user's first event into a fake
      // 600 s gap instead of dropping it
      .withColumn("rawd", idiv(col("ts_us") - lag("ts_us", 1).over(byUser), 1000000L))
      .filter(col("rawd").isNotNull)
      .withColumn("d", least(col("rawd"), lit(BotGapCapS)))
    val s = g.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("d").as("sd"),
        sum(col("d") * col("d")).as("sd2"))
      .filter(col("n_gaps") >= BotMinGaps)
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val sdDec = col("sd").cast(dec19)
    val nD = col("n_gaps").cast(dec19) * col("sd2").cast(dec19) - sdDec * sdDec
    val dD = greatest(sdDec * sdDec,
      lit(1L).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val cv2 = when(col("sd") === 0L, lit(0L))
      .otherwise(idiv(nD * lit(1000000L).cast(
        org.apache.spark.sql.types.DecimalType(7, 0)), dD))
    s.select(col("user_id"), col("n_gaps"),
        idiv(col("sd"), col("n_gaps")).as("mean_gap_s"), cv2.as("cv2_ppm"),
        when(cv2 < BotCv2FloorPpm, 1L).otherwise(0L).as("is_bot"))
      .orderBy("user_id")
  }
  val evBotDetectSql: String = s"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
    g0 AS (SELECT user_id,
            (ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id))
              // 1000000 AS rawd
          FROM e),
    g AS (SELECT user_id, least(rawd, $BotGapCapS) AS d
          FROM g0 WHERE rawd IS NOT NULL),
    s AS (SELECT user_id, COUNT(d) AS n_gaps,
            CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(d*d) AS BIGINT) AS sd2
          FROM g GROUP BY 1
          HAVING COUNT(d) >= $BotMinGaps),
    q AS (SELECT user_id, n_gaps, sd,
            CAST(n_gaps AS HUGEINT) * CAST(sd2 AS HUGEINT)
              - CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT) AS nd,
            GREATEST(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT),
              CAST(1 AS HUGEINT)) AS dd FROM s),
    f AS (SELECT user_id, n_gaps, sd,
            CASE WHEN sd = 0 THEN 0
                 ELSE (nd * 1000000) // dd END AS cv2
          FROM q)
    SELECT user_id, n_gaps, sd // n_gaps AS mean_gap_s,
      CAST(cv2 AS BIGINT) AS cv2_ppm,
      CAST(CASE WHEN cv2 < $BotCv2FloorPpm THEN 1 ELSE 0 END AS BIGINT) AS is_bot
    FROM f ORDER BY user_id"""

  val queries: Map[String, Q] = Map(
    "ev_bot_detect" -> evBotDetect,
    "ev_sequence_pattern" -> evSequencePattern,
    "ev_window_agg" -> evWindowAgg,
    "ev_changepoint" -> evChangepoint,
    "ev_rolling_distinct" -> evRollingDistinct,
    "ev_quantile_sketch" -> evQuantileSketch,
    "ev_rfm" -> evRfm,
    "ev_skew_agg" -> evSkewAgg,
    "ev_retention" -> evRetention,
    "ev_sessionize" -> evSessionize,
    "ev_funnel" -> evFunnel,
    "ev_asof_join" -> evAsofJoin,
    "ev_range_join" -> evRangeJoin,
    "ev_transition" -> evTransition,
    "ev_top_paths" -> evTopPaths,
    "ev_heavy_hitters" -> evHeavyHitters,
    "ev_user_features" -> evUserFeatures,
    "ev_anomaly" -> evAnomaly,
    "ev_props_parse" -> evPropsParse,
    "ev_gap_fill" -> evGapFill,
    "ev_forecast" -> evForecast,
    "ev_histogram" -> evHistogram,
    "ev_moving_window" -> evMovingWindow,
    "ev_attribution" -> evAttribution,
    "ev_count_min" -> evCountMin)

  val oracles: Map[String, String] = Map(
    "ev_bot_detect" -> evBotDetectSql,
    "ev_sequence_pattern" -> evSequencePatternSql,
    "ev_window_agg" -> evWindowAggSql,
    "ev_changepoint" -> evChangepointSql,
    "ev_rolling_distinct" -> evRollingDistinctSql,
    "ev_quantile_sketch" -> evQuantileSketchSql,
    "ev_rfm" -> evRfmSql,
    "ev_skew_agg" -> evSkewAggSql,
    "ev_retention" -> evRetentionSql,
    "ev_sessionize" -> evSessionizeSql,
    "ev_funnel" -> evFunnelSql,
    "ev_asof_join" -> evAsofJoinSql,
    "ev_range_join" -> evRangeJoinSql,
    "ev_transition" -> evTransitionSql,
    "ev_top_paths" -> evTopPathsSql,
    "ev_heavy_hitters" -> evHeavyHittersSql,
    "ev_user_features" -> evUserFeaturesSql,
    "ev_anomaly" -> evAnomalySql,
    "ev_props_parse" -> evPropsParseSql,
    "ev_gap_fill" -> evGapFillSql,
    "ev_forecast" -> evForecastSql,
    "ev_histogram" -> evHistogramSql,
    "ev_moving_window" -> evMovingWindowSql,
    "ev_attribution" -> evAttributionSql,
    "ev_count_min" -> evCountMinSql)
}
