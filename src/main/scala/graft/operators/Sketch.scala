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
  private[graft] def h52(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key.cast("string"))), 1, 13),
      16, 10).cast("long")

  private val h52Sql =
    "CAST(('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)"

  /** registers → (n_reg, registers-as-text, estimate) columns. The
    * estimate: exact size when the sketch never filled (it IS the
    * distinct hash set), else the bottom-k estimator off the k-th
    * smallest hash. */
  private[graft] def estimate(mins: Column): Seq[Column] = Seq(
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

  /** KMV SET ALGEBRA — audience overlap without a join (the theta-
    * sketch intersection, Beyer et al. §4 / Cohen's bottom-k
    * estimators): for user-day sets A ("clicked that day") and B
    * ("purchased that day"), take the k minima of A ∪ B and count how
    * many belong to BOTH sets. Membership is decidable from the two
    * sketches alone — any union-minimum that belongs to A is among
    * A's k smallest, hence in A's registers — so Jaccard ≈ |kU ∩ kA ∩
    * kB| / k and |A ∩ B| ≈ J × est(A ∪ B), all from three k-long
    * register arrays: the classic "overlap of two 100-TB audiences
    * from two kilobyte sketches" move. Every step is exact integer
    * set algebra on registers; the one division is by k = 2^6
    * (exact in binary), and the final product is a single IEEE
    * multiply+floor — bit-identical across engines, so the oracle
    * restates the whole estimator and the hash certifies it. */
  def kmvOverlap(events: DataFrame, typeA: String,
                 typeB: String): DataFrame = {
    graft.functions.HashExpressions.register(events.sparkSession)
    def sk(t: String, nm: String) = events
      .filter(col("event_type") === t && col("user_id").isNotNull)
      .select(h52(concat(col("user_id").cast("string"), lit("@"),
        to_date(col("ts")).cast("string"))).as("h"))
      .agg(kmv_longs_agg(col("h"), K).as(nm))
    // 1×1 crossJoin: two single-row sketch frames (the broadcast
    // scalar-join class, like TextAnalysis's countDistinct scalar)
    val jac = col("num").cast("double") / K
    sk(typeA, "ka").crossJoin(sk(typeB, "kb"))
      .withColumn("ku",
        slice(array_sort(array_union(col("ka"), col("kb"))), 1, K))
      .withColumn("num", size(array_intersect(
        array_intersect(col("ku"), col("ka")), col("kb"))).cast("long"))
      .withColumn("est_union",
        when(size(col("ku")) < K, size(col("ku")).cast("long"))
          .otherwise(floor(lit((K - 1).toDouble) * pow(lit(2.0), lit(52.0)) /
            element_at(col("ku"), K).cast("double"))))
      .select(lit(s"$typeA&$typeB").as("pair"),
        size(col("ku")).cast("long").as("n_union_reg"),
        col("num").as("n_both"),
        col("est_union"),
        jac.as("est_jaccard"),
        floor(jac * col("est_union").cast("double")).as("est_intersection"))
  }

  // ------------------------------------------------------- queries //

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_kmv_distinct" -> ((s, dir) => kmvByType(Tables.load(s, dir, "events"))),
    "c_kmv_merge" -> ((s, dir) => kmvMerged(Tables.load(s, dir, "events"))),
    // user-day audience overlap of two event types — partial overlap
    // by construction (a user-day needs both a click and a purchase),
    // so the gate is non-vacuous at every scale
    "c_kmv_overlap" -> ((s, dir) =>
      kmvOverlap(Tables.load(s, dir, "events"), "click", "purchase")))

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
        s"FROM (SELECT $h52Sql AS h FROM events WHERE user_id IS NOT NULL))"),
    // the whole set-algebra estimator restated on the raw table:
    // per-type user-day sketches, union minima, two-sided membership,
    // the k-division (exact: k = 2^6) and the floor'd product
    "c_kmv_overlap" -> {
      def hs(t: String) =
        "SELECT DISTINCT CAST(('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR) || '@' || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 13)) AS BIGINT) AS h " +
        s"FROM events WHERE event_type = '$t' AND user_id IS NOT NULL"
      s"WITH ka AS (SELECT (list_sort(list(h)))[:$K] AS ka FROM (${hs("click")})), " +
      s"kb AS (SELECT (list_sort(list(h)))[:$K] AS kb FROM (${hs("purchase")})), " +
      s"c AS (SELECT ka, kb, (list_sort(list_distinct(ka || kb)))[:$K] AS ku FROM ka, kb), " +
      "d AS (SELECT ku, CAST(len(list_intersect(list_intersect(ku, ka), kb)) AS BIGINT) AS num, " +
      s"CASE WHEN len(ku) < $K THEN CAST(len(ku) AS BIGINT) ELSE CAST(floor(${K - 1} * pow(2, 52) / ku[$K]) AS BIGINT) END AS est_union FROM c) " +
      "SELECT 'click&purchase' AS pair, CAST(len(ku) AS BIGINT) AS n_union_reg, num AS n_both, est_union, " +
      s"CAST(num AS DOUBLE) / $K AS est_jaccard, " +
      s"CAST(floor((CAST(num AS DOUBLE) / $K) * CAST(est_union AS DOUBLE)) AS BIGINT) AS est_intersection FROM d"
    })
}
