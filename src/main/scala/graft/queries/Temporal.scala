package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.sources.Tables

/** Temporal operators over the `events` table: as-of join, range
  * (interval) self-join, and the tumbling-window aggregation that is
  * the batch twin of the streaming pipeline
  * (`graft.streaming.EventsStream` applies the same transform to a
  * stream — Structured Streaming's batch/stream unification means the
  * logic is written once).
  */
object Temporal {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** As-of join: each purchase matched to the user's most recent
    * signup at-or-before it (DuckDB oracle: native ASOF LEFT JOIN). */
  def asofPurchaseSignup(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asOf(purchases, signups,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightCols = Seq("event_id" -> "signup_id"))
      .select(col("purchase_id"), col("user_id"), col("signup_id"))
  }

  /** Naive range self-join: ordered same-user event pairs ≤ 5 minutes
    * apart. The equi-key (user_id) carries the shuffle; the range
    * predicate filters AFTER the per-user cross product materializes —
    * quadratic in a hot user's history, and AQE splits partitions, not
    * a single key's pairs, so it cannot save this plan. Kept ONLY as
    * the spec-checked exact twin of [[rangePairsBucketed]] (the
    * headline `q_range_join` plan, which bounds fan-out to two
    * time buckets per row regardless of history length). */
  def rangePairs(s: SparkSession, dir: String): DataFrame = {
    val a = events(s, dir).select(col("user_id"),
      col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = events(s, dir).select(col("user_id"),
      col("event_id").as("b_id"), col("ts").as("b_ts"))
    a.join(b, Seq("user_id"))
      .filter(col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a_id"), col("b_id"))
  }

  /** Forward as-of: each purchase matched to the user's NEXT signup
    * at-or-after it (direction flag on the same operator). */
  def asofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asOf(purchases, signups,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightCols = Seq("event_id" -> "signup_id"), forward = true)
      .select(col("purchase_id"), col("user_id"), col("signup_id"))
  }

  /** Bucketed range join — the scale path for the same semantics as
    * [[rangePairs]]. Each event lands in a 5-minute time bucket; a
    * pair within 5 minutes is in the same or adjacent buckets, so the
    * join key becomes (user_id, bucket) with the left side exploded
    * to (bucket, bucket+1) — bounding per-task fan-out to two buckets
    * regardless of how long a user's history is. The range predicate
    * then filters exactly. Oracle: identical output to the naive
    * formulation. */
  def rangePairsBucketed(s: SparkSession, dir: String): DataFrame = {
    val bucketSec = 300L
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      col("ts"), (unix_timestamp(col("ts")) / bucketSec).cast("long").as("bk"))
    val a = ev.select(col("user_id"), col("event_id").as("a_id"),
        col("ts").as("a_ts"),
        explode(array(col("bk"), col("bk") + 1)).as("bk"))
    val b = ev.select(col("user_id"), col("event_id").as("b_id"),
      col("ts").as("b_ts"), col("bk"))
    // no distinct needed: b carries ONE bucket, so each qualifying
    // pair matches in exactly one of the left's two exploded buckets
    a.join(b, Seq("user_id", "bk"))
      .filter(col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a_id"), col("b_id"))
  }

  /** Batch sessionization — the oracle-checkable twin of the
    * streaming `flatMapGroupsWithState` sessionizer: a session break
    * is a >30-min gap; session ids are the running count of breaks
    * (lag + cumulative sum over the per-user time order). */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events(s, dir)
      .withColumn("brk",
        when(unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser)) > 30L * 60 * 1000000,
          1).otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Tumbling 1-hour window aggregation (the streaming twin groups by
    * the same window with a watermark). */
  def hourlyRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("value")) * 1e2) / 1e2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Conversion funnel view → click → purchase with strictly
    * advancing stage timestamps. Each stage is a per-user MIN
    * aggregate joined to the previous stage's users — the stage
    * tables shrink monotonically, so at scale each join's right side
    * is the (small) surviving cohort. One row out. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    // v feeds c AND its own count, c feeds p AND its count — cache
    // the cohorts so each stage aggregation runs once. The output is
    // three scalars, so the stage counts are computed EAGERLY while
    // the caches are live and both cohorts unpersist before return —
    // no storage-memory blocks outlive the call (the round-2 leak)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val nPurchase = p.count() // populates both caches en route
        val nView = v.count()
        val nClick = c.count()
        import s.implicits._
        Seq((nView, nClick, nPurchase))
          .toDF("n_view", "n_click", "n_purchase")
      } finally { c.unpersist(blocking = true); () }
    } finally { v.unpersist(blocking = true); () }
  }

  /** PER-ENTITY calendar gap fill — the scale-path variant of
    * [[resampleDaily]]: each user's daily purchase series is
    * completed over that user's own [min, max] day span (sequence +
    * explode builds the calendar distributedly, one row group per
    * user) and the last observed daily total carries forward across
    * the gaps. Every stage partitions by user_id: the calendar
    * explode, the left join back to observed days, and the ffill
    * window — NO single-partition window anywhere (plan-pinned),
    * which is what makes this run at 100 TB where a global-ordering
    * fill cannot. Daily totals are rounded to cents once, at the
    * aggregate, so the value carried forward is bit-identical on
    * both engines. */
  def gapFillPerUser(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg((round(sum(col("value")) * 1e2) / 1e2).as("v"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        last(col("v"), ignoreNulls = true).over(w).as("ffill"))
  }

  /** Daily resample with gap fill: the day grid spans [min, max]
    * purchase day, missing days fill 0, and `ffill` carries the last
    * seen total forward (the last-observation-carried-forward shape).
    * The grid is O(days) — the single-partition ffill window is over
    * days, not events, so the global ordering is a non-issue at any
    * corpus size. */
  def resampleDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir).filter(col("event_type") === "purchase")
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(sum(col("value")).as("total"))
    val grid = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (round(coalesce(col("total"), lit(0.0)) * 1e2) / 1e2).as("total"),
        (round(last(col("total"), ignoreNulls = true).over(w) * 1e2) / 1e2)
          .as("ffill"))
  }

  /** Cohort retention matrix — the product-analytics staple: users
    * cohorted by first-active day, and for each (cohort, day-offset)
    * cell the count of cohort users active that day. Scale shape: ONE
    * events shuffle — a single user-keyed aggregation computes the
    * cohort (min day) AND the distinct active-day set together
    * (collect_set partial-merges map-side; per-user state is bounded
    * by the calendar, ~30 entries), then the exploded (cohort,
    * offset) rollup counts rows, which ARE distinct users by
    * construction. (The textbook two-aggregations-plus-join shape
    * shuffles events twice and re-exchanges for the join; this is
    * the same result one exchange earlier.) */
  def retention(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"), collect_set(col("day")).as("days"))
      .select(col("cohort"), explode(col("days")).as("day"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** First-order Markov transition counts over per-user event
    * sequences — the "what happens after a click" model. The lag
    * window shuffles once on user_id (per-user histories are
    * partition-sized; a pathological user pre-splits by time range);
    * the transition matrix itself is |event_types|² rows, so the
    * per-row probability normalization windows over a model-sized
    * table, not the corpus. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val counts = ev
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type")))
          .cast("double") * 1e4) / 1e4)
  }

  /** Declarative gap-sessions via Spark's native `session_window` —
    * the Catalyst-operator twin of the two custom-state sessionizers
    * ([[sessionizeBatch]]'s lag/cumsum windows and
    * `EventsStream.sessionize`'s flatMapGroupsWithState): one
    * aggregation, merging windows engine-side. Same one-shuffle
    * shape as any keyed agg; in streaming mode the identical
    * expression runs with watermark-bounded state. A session's end
    * is last-event + gap (the session_window contract) — the oracle
    * restates that closed form. */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  /** Peak concurrency per hour — the sweep-line census over session
    * intervals ("how many sessions were active at once"): every
    * session contributes a +1 point at its start and a −1 at its end
    * (end = last event + gap, [[sessionWindows]]'s native
    * `session_window` bounds), the points order globally by
    * (t, delta, user) — ends before starts at a shared instant, so a
    * back-to-back handoff never counts as overlap — and the running
    * sum of deltas IS the active-session count after each point; the
    * hourly max of that running value is the published row.
    *
    * Scale design: the global running sum is a DISTRIBUTED two-level
    * prefix sum (the [[graft.operators.Corpus.packSequences]] shape),
    * never one unbounded window. Points bucket by UTC day — a PREFIX
    * of the (t, …) total order, so buckets tile it — per-day delta
    * totals (≤ one row per day in the corpus, driver-model-sized at
    * any corpus scale) collect for exclusive day offsets, and the
    * within-day cumsum runs as independent day-partitioned windows
    * whose size is one day's session churn. At 100 TB drop to hour
    * buckets: same two jobs, finer tiles. */
  def concurrencyPerHour(s: SparkSession, dir: String): DataFrame = {
    val us = 1000000L
    val iv = events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"))
    // materialize the sweep points ONCE: the driver-side day-total
    // collect below and the returned ranking plan both consume them,
    // and an unpinned lineage recomputed the full session_window
    // aggregation — the query's most expensive stage — twice per run
    // (code-review r10). Write-and-readback, not persist: the
    // returned plan is consumed after this function returns, so an
    // unpersist-before-return would evict the cache before the
    // action, and leaving it cached would break the persist-hygiene
    // gate.
    val pts = graft.operators.Dedup.materialize(
      iv.select(col("start_us").as("t"), lit(1).as("delta"), col("user_id"))
        .unionAll(iv.select(col("end_us").as("t"), lit(-1).as("delta"),
          col("user_id")))
        .withColumn("day", expr(s"t DIV ${86400L * us}L")),
      "conc_pts")
    val dayTotals = pts.groupBy(col("day"))
      .agg(sum(col("delta")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val dayOffset: Map[Long, Long] = dayTotals.map { case (d, t) =>
      val e = d -> acc; acc += t; e
    }.toMap
    val wd = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("delta"), col("user_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pts
      .withColumn("active",
        element_at(typedLit(dayOffset), col("day")) +
          sum(col("delta").cast("long")).over(wd))
      .groupBy(expr(s"t DIV ${3600L * us}L").as("h"))
      .agg(max(col("active")).as("max_active"))
      .select((col("h") * (3600L * us)).as("hour_us"), col("max_active"))
  }

  /** Sliding (hopping) 1-hour windows at a 15-minute slide — each
    * event lands in windowSize/slide = 4 windows. Completes the
    * window-type trio (tumbling `q_stream_window`, session
    * `q_session_window`, sliding here); the same expression runs
    * streaming with a watermark, state = open windows only. Spark
    * expands the 4 memberships per row BEFORE the aggregation's
    * map-side partial combine, so the shuffle still carries
    * (window, type) partials, not events. */
  def slidingRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("value")) * 1e2) / 1e2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("win_start"), col("event_type"), col("n"), col("total_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sliding_window" -> (slidingRollup _),
    "q_session_window" -> (sessionWindows _),
    "q_retention" -> (retention _),
    "q_event_transitions" -> (eventTransitions _),
    "q_funnel" -> (funnel _),
    "q_resample" -> (resampleDaily _),
    "q_gap_fill" -> (gapFillPerUser _),
    "q_asof_join" -> (asofPurchaseSignup _),
    "q_asof_forward" -> (asofForward _),
    // the headline range join runs the bounded-fan-out bucketed plan
    // (the one you'd ship at 100×); the naive per-user-cross-product
    // formulation survives as rangePairs, pinned identical by
    // TemporalSpec — the oracle is plan-agnostic SQL either way
    "q_range_join" -> (rangePairsBucketed _),
    "q_stream_window" -> (hourlyRollup _),
    // the literal streaming definition run in batch mode (watermarks
    // no-op) — the stream-stream interval join's oracled twin
    "q_stream_join" -> ((s, dir) =>
      graft.streaming.EventsStream.clickAttribution(events(s, dir))),
    // stream-static dimension enrichment's oracled batch twin — the
    // same function the streaming spec drives micro-batched
    "q_stream_enrich" -> ((s, dir) =>
      graft.streaming.EventsStream.enrichWithCustomer(
        events(s, dir), Tables.load(s, dir, "customer"))),
    "q_sessionize" -> (sessionizeBatch _),
    "q_concurrency" -> (concurrencyPerHour _))

  val oracle: Map[String, String] = Map(
    // the oracle restates the sweep as ONE global running-sum window
    // (the single-machine formulation); equality proves the two-level
    // day-bucketed prefix sum computes the identical global order and
    // prefix values. Session bounds restate session_window: start =
    // first event, end = last event + gap.
    "q_concurrency" ->
      """WITH s AS (SELECT user_id, ts, event_id,
        |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 30*60*1000000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT user_id, ts,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s),
        |iv AS (SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
        |  CAST(epoch_us(max(ts)) AS BIGINT) + 30*60*1000000 AS end_us
        |  FROM g GROUP BY user_id, sid),
        |pts AS (SELECT start_us AS t, 1 AS delta, user_id FROM iv
        |  UNION ALL SELECT end_us, -1, user_id FROM iv),
        |run AS (SELECT t, CAST(sum(delta) OVER (ORDER BY t, delta, user_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active FROM pts)
        |SELECT (t // 3600000000) * 3600000000 AS hour_us, max(active) AS max_active
        |FROM run GROUP BY 1""".stripMargin,
    // each event expands to its 4 containing hop windows via epoch-µs
    // integer arithmetic (Spark's hop grid is epoch-aligned; so is
    // this one — both grids are multiples of 15 min from epoch)
    "q_sliding_window" ->
      """WITH x AS (SELECT event_type, value,
        |             make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) AS ws,
        |             epoch_us(ts) AS tus
        |           FROM events, (SELECT unnest(range(0, 4)) AS k))
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |  count(*) AS n, round(sum(value)*1e2)/1e2 AS total_value
        |FROM x WHERE tus < epoch_us(ws) + 3600000000 GROUP BY 1, 2""".stripMargin,
    // gap-sessionize via lag/cumsum (the q_sessionize mechanism),
    // then restate session_window's bounds: start = first event,
    // end = last event + gap
    "q_session_window" ->
      """WITH s AS (SELECT user_id, ts,
        |             CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 30*60*1000000 THEN 1 ELSE 0 END AS brk,
        |             event_id
        |           FROM events),
        |g AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM s)
        |SELECT user_id,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
        |  CAST(epoch_us(max(ts) + INTERVAL 30 MINUTE) AS BIGINT) AS end_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q_retention" ->
      """WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', f.cohort, a.day) AS INTEGER) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,
    "q_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |           FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) * 1e4)/1e4 AS p
        |FROM c""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view, (SELECT count(*) FROM c) AS n_click, (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "q_resample" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day, sum(value) AS total FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |grid AS (SELECT unnest(generate_series((SELECT min(day) FROM daily), (SELECT max(day) FROM daily), INTERVAL 1 DAY)) AS day)
        |SELECT strftime(g.day, '%Y-%m-%d') AS day,
        |  round((coalesce(d.total, 0))*1e2)/1e2 AS total,
        |  round((last_value(d.total IGNORE NULLS) OVER (ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))*1e2)/1e2 AS ffill
        |FROM grid g LEFT JOIN daily d ON g.day = d.day""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, round((sum(value))*1e2)/1e2 AS v FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cal AS (SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day FROM daily GROUP BY user_id)
        |SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
        |  last_value(d.v IGNORE NULLS) OVER (PARTITION BY c.user_id ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
        |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day""".stripMargin,
    "q_asof_join" ->
      "SELECT p.event_id AS purchase_id, p.user_id AS user_id, l.event_id AS signup_id FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l ON p.user_id = l.user_id AND p.ts >= l.ts",
    "q_asof_forward" ->
      "SELECT p.event_id AS purchase_id, p.user_id AS user_id, l.event_id AS signup_id FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l ON p.user_id = l.user_id AND p.ts <= l.ts",
    "q_range_join" ->
      "SELECT a.event_id AS a_id, b.event_id AS b_id FROM events a JOIN events b ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE",
    "q_stream_window" ->
      "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type, count(*) AS n, round((sum(value))*1e2)/1e2 AS total_value FROM events GROUP BY 1, 2",
    "q_stream_join" ->
      "SELECT a.user_id, a.event_id AS view_id, b.event_id AS click_id, CAST(epoch_us(a.ts) AS BIGINT) AS view_us, CAST(epoch_us(b.ts) AS BIGINT) AS click_us FROM events a JOIN events b ON a.user_id = b.user_id AND a.event_type = 'view' AND b.event_type = 'click' AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE",
    "q_stream_enrich" ->
      "SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey",
    "q_sessionize" ->
      "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events FROM (SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM (SELECT user_id, ts, event_id, CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 30*60*1000000 THEN 1 ELSE 0 END AS brk FROM events)) GROUP BY user_id, session_id")
}
