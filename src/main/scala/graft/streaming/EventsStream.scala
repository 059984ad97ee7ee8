package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY §2.C: absent in the reference,
  * first-class here): the `events` table as a stream.
  *
  * Batch/stream unification: [[windowedRollup]] is the same logical
  * transform as `Temporal.hourlyRollup` — written against an unbounded
  * DataFrame with a watermark bounding state. [[sessionize]] shows
  * custom state: per-user sessions split on 30-minute gaps via
  * `flatMapGroupsWithState` (the mapGroupsWithState family is the
  * Spark-native form of arbitrary keyed streaming state).
  *
  * At scale: state lives in the state store keyed by (window,
  * event_type) / user_id; the watermark caps it — without one, a
  * 100 TB replay would accumulate state forever. Late rows beyond
  * 10 minutes are dropped, matching the declared correctness contract.
  */
object EventsStream {

  /** Watermarked tumbling-window counts (append mode capable). */
  def windowedRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  final case class Ev(event_id: Long, ts: java.sql.Timestamp,
                      user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Int,
                           start: java.sql.Timestamp, end: java.sql.Timestamp)
  private final case class SessState(n: Int, start: Long, last: Long)

  /** Gap-based sessionization with explicit keyed state + processing-
    * time timeout: a session closes when 30 min pass without events. */
  def sessionize(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L

    events.as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.n, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(n = s.n + 1, last = t))
                case Some(s) =>
                  closed += Session(uid, s.n, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last))
                  cur = Some(SessState(1, t, t))
                case None =>
                  cur = Some(SessState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }.toDF()
  }

  /** Streaming dedup: drop repeat (user_id, event_type) observations
    * within the watermark horizon — state is bounded by the watermark
    * (Spark purges keys older than it), which is what makes streaming
    * dedup viable on an unbounded stream. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join (click attribution): each view
    * joined to the same user's clicks in (view_ts, view_ts + 30 min].
    * Watermarks on BOTH sides plus the time-range condition are what
    * let Spark bound the join state: a buffered view older than
    * watermark + 30 min can never match a future click and is
    * evicted — without the range bound, stream-stream join state
    * grows forever. On a batch frame the watermark is a no-op and the
    * SAME function is the DuckDB-oracled twin (`q_stream_join`) —
    * one definition, two execution modes. */
  def clickAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "30 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    views.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") > col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("click_ts")).as("click_us"))
  }

  /** Stream-static dimension enrichment — the remaining core
    * Structured Streaming join shape (stream-stream is
    * [[clickAttribution]]): each event joined to its user's customer
    * dimension row. The static side re-resolves per micro-batch (so
    * a dimension refresh is picked up without restarting) and
    * BROADCASTS — stream state is ZERO because the static side never
    * buffers, the property that makes dimension enrichment free at
    * any stream rate. Left join: an event without a dimension row
    * survives with nulls (dropped-dim rows must not drop facts). The
    * SAME function on a batch frame is the DuckDB-oracled twin
    * (`q_stream_enrich`). */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
        broadcast(customer.select(col("c_custkey").as("user_id"),
          col("c_name"), col("c_mktsegment"))),
        Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_mktsegment"))

  /** Drive a streaming query synchronously from a batch parquet dir
    * (memory sink) — the local smoke path; swap `readStream` source +
    * `writeStream` sink for kafka/delta in deployment. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    // schema-adaptive events read (nanos vs micros testdata
    // generations) — shared with the batch loader via Tables
    val stream = graft.sources.Tables.streamEvents(spark, dir)
    val q = windowedRollup(stream).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
