package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions.kmv_longs_agg
import graft.sources.Tables

/** Mergeable cardinality sketches over the event stream — the
  * "distinct users per segment, rolled up across shards" primitive a
  * 100-TB pipeline needs where exact `countDistinct` is the shuffle
  * bottleneck: counting distinct per group ships every distinct
  * (group, value) pair across the wire, while a KMV sketch ships at
  * most k longs per (partition, group) and re-aggregates losslessly
  * (see [[graft.functions.Kmv]] for the estimator and the monoid
  * argument).
  *
  * Hashing device: values map to 52-bit integers via md5 (the
  * engine-stable derivation every md5-keyed gate shares —
  * `conv(substring(md5(x), 1, 13), 16, 10)`). 52 bits keeps every
  * hash exactly representable in a double, so the one float step of
  * the estimator — `floor((k-1) * 2^52 / h_k)` — is a single IEEE
  * divide of exactly-representable operands on both engines:
  * bit-identical, no rounding-boundary hazard. Registers themselves
  * are exact integers, emitted in full, so the oracle hash certifies
  * the entire sketch state — not an approximation tolerance.
  */
object Sketch {

  /** Sketch size: estimates carry ~1/sqrt(k-1) ≈ 13% relative error
    * at k=64 — the audit-dashboard regime; raise k for tighter. */
  val K = 64

  /** 52-bit md5-derived hash (13 hex chars) — exactly representable
    * in a double, so the estimator divide is engine-exact. */
  private def h52(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key.cast("string"))), 1, 13),
      16, 10).cast("long")

  private val h52Sql =
    "CAST(('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)"

  /** registers → (n_reg, registers-as-text, estimate) columns. The
    * estimate: exact size when the sketch never filled (it IS the
    * distinct hash set), else the bottom-k estimator off the k-th
    * smallest hash. */
  private def estimate(mins: Column): Seq[Column] = Seq(
    size(mins).cast("long").as("n_reg"),
    array_join(transform(mins, _.cast("string")), ",").as("registers"),
    when(size(mins) < K, size(mins).cast("long"))
      .otherwise(floor(lit((K - 1).toDouble) * pow(lit(2.0), lit(52.0)) /
        element_at(mins, K).cast("double")))
      .as("est_distinct"))

  /** Per-event-type distinct-user sketches: one k-bounded aggregate,
    * exchange carries ≤ K longs per (partition, type). */
  def kmvByType(events: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(events.sparkSession)
    events.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(kmv_longs_agg(h52(col("user_id")), K).as("mins"))
      .select(col("event_type") +: estimate(col("mins")): _*)
      .orderBy(col("event_type"))
  }

  /** Sketch UNION: merge the per-type sketches into the global
    * distinct-user estimate by re-aggregating their registers —
    * never re-reading the events. Correct because KMV is a monoid:
    * each of the k global minima is within its own group's k minima,
    * so union-then-truncate equals the sketch built from scratch —
    * which is exactly what the oracle computes (from the raw table),
    * making the hash match a PROOF of the merge property on this
    * corpus, not just a unit test. */
  def kmvMerged(events: DataFrame): DataFrame =
    kmvByType(events)
      .select(explode(split(col("registers"), ",")).as("h"))
      .agg(kmv_longs_agg(col("h").cast("long"), K).as("mins"))
      .select(lit("all").as("scope") +: estimate(col("mins")): _*)

  // ------------------------------------------------------- queries //

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_kmv_distinct" -> ((s, dir) => kmvByType(Tables.load(s, dir, "events"))),
    "c_kmv_merge" -> ((s, dir) => kmvMerged(Tables.load(s, dir, "events"))))

  // -------------------------------------------------------- oracle //

  private val sketchSql =
    s"SELECT event_type, (list_sort(list(DISTINCT h)))[:$K] AS mins " +
    s"FROM (SELECT event_type, $h52Sql AS h FROM events WHERE user_id IS NOT NULL) " +
    "GROUP BY event_type"

  private def estimateSql =
    s"CAST(len(mins) AS BIGINT) AS n_reg, array_to_string(mins, ',') AS registers, " +
    s"CASE WHEN len(mins) < $K THEN CAST(len(mins) AS BIGINT) " +
    s"ELSE CAST(floor(${K - 1} * pow(2, 52) / mins[$K]) AS BIGINT) END AS est_distinct"

  val oracle: Map[String, String] = Map(
    "c_kmv_distinct" ->
      (s"SELECT event_type, $estimateSql FROM ($sketchSql) " +
        "ORDER BY event_type"),
    // the oracle builds the GLOBAL sketch from the raw table; the
    // Spark side merges the per-type sketches — hash equality is the
    // monoid proof
    "c_kmv_merge" ->
      (s"SELECT 'all' AS scope, $estimateSql FROM " +
        s"(SELECT (list_sort(list(DISTINCT h)))[:$K] AS mins " +
        s"FROM (SELECT $h52Sql AS h FROM events WHERE user_id IS NOT NULL))"))
}
