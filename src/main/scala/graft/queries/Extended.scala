package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Extended relational coverage beyond the reference's surface
  * (SURVEY §2.C families, exercised fully): grouping-set variants,
  * window offset/rank functions, percentiles, pivot, outer joins,
  * subquery forms, null handling, and the SQL-string surface
  * (spark.sql over registered views — proving both entry points share
  * one Catalyst plan space). */
object Extended {

  // ONE rounding-grid contract for the whole battery — see the
  // scaladoc on Relational.round (code-review r10: three drifting
  // copies of a parity-critical helper)
  private def round(c: Column, n: Int): Column = Relational.round(c, n)

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables.load(s, dir, name)

  /** CUBE over (returnflag, linestatus). */
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem").cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))

  /** Explicit GROUPING SETS via the SQL surface. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())""")
  }

  /** Window offsets: lag/lead of order price within customer. */
  def qLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir)("orders").select(
      col("o_custkey"), col("o_orderkey"),
      round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
      round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"))
  }

  /** Ranking family: rank / dense_rank / percent_rank. */
  def qRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir)("lineitem").select(
      col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      round(percent_rank().over(w), 6).as("prnk"))
  }

  /** First/last value over a bounded frame. */
  def qFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir)("orders").select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(w).as("first_order"),
      last(col("o_orderkey")).over(w).as("last_order"))
  }

  /** Exact percentiles (continuous interpolation). */
  def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders").groupBy(col("o_orderstatus")).agg(
      round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
      round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))

  /** Pivot: status → columns (oracle: conditional aggregation). */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders").groupBy(col("o_custkey"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_custkey"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"),
        coalesce(col("P"), lit(0L)).as("n_pending"))

  /** Unpivot (melt): wide per-line measures → long (measure, value)
    * rows via the native Dataset.unpivot — a Generate (Expand) per
    * row, zero shuffles; the inverse of [[qPivot]]. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .select(col("l_orderkey"), col("l_linenumber"), col("measure"),
        round(col("value"), 2).as("value"))

  /** Right outer join (parts never ordered keep nulls → flagged). */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir)("lineitem").groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"))
    val p = t(s, dir)("part")
    li.join(p, li("l_partkey") === p("p_partkey"), "right_outer")
      .select(col("p_partkey"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
  }

  /** Full outer join over two aggregates. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val byCust = t(s, dir)("orders").filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_open"))
    val byCust2 = t(s, dir)("orders").filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_fin"))
    byCust.join(byCust2, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_fin"), lit(0L)).as("n_fin"))
  }

  /** Cross join (constant-size dims only — the planner must see it's
    * a 5×25 product, not an accidental blow-up). */
  def qCrossJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("region").crossJoin(t(s, dir)("nation"))
      .select(col("r_name"), col("n_name"))

  /** IN / NOT IN subqueries via the SQL surface. */
  def qInSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""SELECT c_custkey FROM customer
             WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""")
  }

  /** Correlated scalar subquery via the SQL surface. */
  def qCorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""SELECT o_orderkey,
                    round((SELECT sum(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey)*1e2)/1e2 AS total_qty
             FROM orders WHERE o_orderkey < 1000""")
  }

  /** UNION ALL + INTERSECT. */
  def qUnionAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .unionAll(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
  }

  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
  }

  /** Null-handling scalar family: coalesce / nullif / nvl2-style. */
  def qNullFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("customer").select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
        .as("segment_or_other"),
      when(col("c_acctbal") > 0, "pos").when(col("c_acctbal") < 0, "neg")
        .otherwise("zero").as("bal_sign"))

  /** Sketch aggregates: HLL++ distinct count + quantile sketch.
    * Different sketch ALGORITHMS give different estimates by design,
    * so the raw estimates cannot hash-match a DuckDB oracle — instead
    * the query emits the EXACT values (SQL-expressible in both
    * engines) plus within-5%-tolerance booleans over Spark's sketch
    * estimates; the oracle states the exact values with literal TRUE
    * flags. Hash equality therefore proves both the exact arithmetic
    * AND that each sketch landed within tolerance — the oracle-checked
    * form of the round-3 OperatorsSpec-only pin. */
  def qApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem").groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      expr("percentile(l_extendedprice, 0.5D)").as("ep50"),
      approx_count_distinct(col("l_partkey")).as("ac"),
      expr("approx_percentile(l_extendedprice, 0.5)").as("ap50"))
    .select(col("l_returnflag"), col("exact_parts"),
      round(col("ep50"), 2).as("exact_p50"),
      (abs(col("ac") - col("exact_parts")).cast("double") /
        col("exact_parts") <= 0.05).as("parts_within_5pct"),
      (abs(col("ap50") - col("ep50")) / col("ep50") <= 0.05)
        .as("p50_within_5pct"))

  /** TPC-H Q5 shape: 6-way join (region→nation→customer→orders→
    * lineitem→supplier) with filters. Catalyst orders the joins and
    * broadcasts the constant-size dims (region/nation) and the
    * mid-size dims under AQE — the fact table shuffles at most on its
    * join keys. */
  def qTpchQ5(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(t(s, dir)("region").filter(col("r_name") === "ASIA"))
    val nation = broadcast(t(s, dir)("nation"))
    val customer = t(s, dir)("customer")
    val orders = t(s, dir)("orders").filter(col("o_orderstatus") =!= "P")
    val lineitem = t(s, dir)("lineitem")
    val supplier = t(s, dir)("supplier")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** TPC-H Q10 shape: returned-item reporting — join + filter + agg +
    * top-k by revenue. */
  def qTpchQ10(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir)("lineitem").filter(col("l_returnflag") === "R")
    val o = t(s, dir)("orders")
    val c = t(s, dir)("customer")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** HAVING: post-aggregation filter. */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem").groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .filter(col("n") >= 45)

  /** RANGE window frame: count of orders within ±10000 of each
    * order's price (value-range frame, not row frame; ordered on
    * integer cents — Spark's rangeBetween takes long bounds).
    * floor() on BOTH sides: a bare Spark cast truncates toward zero
    * while DuckDB's CAST rounds to nearest — the keys diverge on
    * ~5% of rows and flip frame-boundary counts at sf0.1. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(cents)
      .rangeBetween(-1000000L, 1000000L)
    t(s, dir)("orders").select(
      col("o_orderkey"),
      count(lit(1)).over(w).as("n_similar"))
  }

  /** Second string family: replace / pad / part extraction / trim. */
  def qString2(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("part").select(
      col("p_partkey"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      lpad(col("p_brand"), 12, "*").as("brand_pad"),
      element_at(split(col("p_type"), " "), 1).as("type_first"),
      reverse(col("p_brand")).as("brand_rev"))

  /** Second date family: arithmetic + diffs + parts. */
  def qDate2(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders").select(
      col("o_orderkey"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
      datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate")))
        .cast("long").as("days_to_2002"),
      dayofweek(col("o_orderdate")).cast("int").as("dow"),
      quarter(col("o_orderdate")).cast("int").as("qtr"))

  /** Second math family: pow/exp/mod/sign/greatest/least. */
  def qMath2(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(pow(col("l_discount") + 1, 3), 6).as("disc_pow"),
      round(exp(col("l_discount")), 6).as("disc_exp"),
      pmod(col("l_partkey"), lit(7L)).as("pk_mod"),
      signum(col("l_discount") - 0.05).cast("int").as("d_sign"),
      greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
      least(col("l_tax"), col("l_discount")).as("l"))

  /** TPC-H Q18 shape (large-volume customers): the inner HAVING
    * aggregate reduces lineitem to qualifying orderkeys BEFORE any
    * join — at 100 TB the join probe side is the filtered aggregate
    * (473 rows at sf0.1), never raw lineitem. */
  /** TPC-H Q3 shape: shipping-priority top-k — the two-sided
    * date-window join (orders placed before the cutoff, lines shipped
    * after it) with revenue ranking. Both date predicates sit
    * directly on their scans (pushed to parquet), the join carries
    * only surviving keys, and the top-10 runs as
    * TakeOrderedAndProject — no global sort. The testdata schema has
    * no c_mktsegment, so the segment filter becomes the
    * o_orderpriority slice (same selectivity role). */
  def qTpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-01-01"
    val o = t(s, dir)("orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") < lit(cutoff))
    val li = t(s, dir)("lineitem").filter(col("l_shipdate") > lit(cutoff))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd")
        .as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q6 shape: forecast-revenue change — the pure
    * scan+filter+agg probe. Every predicate is a parquet-pushable
    * range on a scan column, the projection reads three columns, and
    * the whole plan is one WholeStageCodegen span over a partial+final
    * agg: the canonical "did pushdown/pruning actually happen" gate
    * (PlanAuditSpec pins PushedFilters on exactly this shape). */
  def qTpchQ6(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** TPC-H Q4 shape (order-priority checking): EXISTS over lineitem
    * as a LEFT SEMI join whose condition carries BOTH the equi key and
    * the correlated non-equi date predicate (l_shipdate > o_orderdate,
    * the testdata's "shipped after ordering" stand-in for
    * commitdate < receiptdate). At 100 TB the semi join probes only
    * the three-month orders slice (date range pushed to the orders
    * scan) and emits each order at most once — no post-join dedup. */
  def qTpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders")
      .filter(col("o_orderdate") >= lit("1997-07-01") &&
        col("o_orderdate") < lit("1997-10-01"))
    val li = t(s, dir)("lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
  }

  /** TPC-H Q12 shape (priority-class counting): the join feeds a
    * conditional two-bucket aggregation (CASE inside SUM) — one
    * shuffle for the join, map-side partial agg collapses the
    * per-line booleans before the final exchange. The testdata has no
    * l_shipmode, so l_returnflag plays the mode dimension. */
  def qTpchQ12(s: SparkSession, dir: String): DataFrame = {
    val hi = Seq("1-URGENT", "2-HIGH")
    val li = t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_returnflag"))
    val o = t(s, dir)("orders").select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin(hi: _*), 0L).otherwise(1L))
          .as("low_line_count"))
  }

  /** TPC-H Q14 shape (promo-revenue ratio): one month of lineitem
    * joins the part dim — part is broadcast (dim ≪ fact at every
    * scale), so the month slice never shuffles; the ratio is a single
    * two-accumulator aggregate over the joined slice. */
  def qTpchQ14(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01") &&
        col("l_shipdate") < lit("1997-10-01"))
    val p = t(s, dir)("part").select(col("p_partkey"), col("p_type"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))) /
        sum(rev), 4).as("promo_revenue"))
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * `l_quantity < 0.2 * avg(quantity per part)` subquery becomes an
    * explicit per-part aggregate joined back to the qualifying lines.
    * Order of operations is the scale story: the part filter
    * broadcasts FIRST, shrinking lineitem to the qualifying parts
    * before the avg aggregate runs — the per-part avg is computed
    * over ~10% of keys, not all of them (the semantics allow it
    * because the avg is per-part and unaffected by which parts
    * survive the dim filter). */
  def qTpchQ17(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir)("part").filter(col("p_size") <= 5).select(col("p_partkey"))
    val li = t(s, dir)("lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val avgQ = li.groupBy(col("l_partkey").as("ak"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_cut"))
    li.join(avgQ, col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** TPC-H Q7 shape (volume shipping between two nations): the
    * two-nation restriction is pushed INTO the supplier and customer
    * dims BEFORE any fact join — each fact row must end in one of the
    * two nations on both sides, so the supplier-side broadcast cuts
    * lineitem to ~2/|nations| of its rows before the orderkey
    * shuffle, and the customer side probes with an equally-shrunk
    * slice. The residual symmetric-pair disjunction reduces to
    * `supp_nation <> cust_nation` (both ends are already in the
    * pair). Measured at 100×/8 cpus: the late-filter formulation
    * (dims resolved after the full fact chain) took 50.7 s; this
    * early-push shape cut the shuffled volume by ~12× — the
    * difference between a plan that survives 100 TB and one that
    * doesn't. */
  def qTpchQ7(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val nS = t(s, dir)("nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val nC = t(s, dir)("nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val sup = t(s, dir)("supplier")
      .join(broadcast(nS), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = t(s, dir)("customer")
      .join(broadcast(nC), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    val li = t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir)("orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** TPC-H Q8 shape (national market share): conditional-fraction
    * aggregate per year — sum(CASE nation)/sum(all) collapses
    * map-side, so the final exchange carries two doubles per year.
    * Join ORDER is the scale lever: the region restriction shrinks
    * customer to ~1/|regions| FIRST, orders joins that slice (small
    * enough to broadcast for many scales; a custkey shuffle of the
    * slice otherwise), and only then does the fact table join — the
    * orderkey shuffle carries region-qualified orders, never the
    * whole orders table twice. Measured at 100×/8 cpus: the
    * fact-first ordering ran 110 s; this slice-first ordering is the
    * one that survives growth. */
  def qTpchQ8(s: SparkSession, dir: String): DataFrame = {
    val nS = t(s, dir)("nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val nC = t(s, dir)("nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("c_rkey"))
    val r = t(s, dir)("region").filter(col("r_name") === "ASIA")
    val cust = t(s, dir)("customer")
      .join(broadcast(nC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("c_rkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val o = t(s, dir)("orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t(s, dir)("lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir)("supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nS), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0.0))) /
          sum(rev), 6).as("mkt_share"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join so zero-order customers survive with count 0, then a
    * two-level aggregate (per-customer count → histogram of counts).
    * The priority filter sits on the orders side BEFORE the join —
    * the left-join equivalent of the spec's ON-clause predicate —
    * so at 100 TB the outer join probes only qualifying orders. The
    * histogram's second exchange carries one row per distinct count
    * value (~tens), not per customer. */
  def qTpchQ13(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    t(s, dir)("customer").select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15 shape (top supplier): per-supplier quarterly revenue,
    * then the max-revenue supplier(s) selected by joining the rounded
    * revenue back against its own scalar max — ties included, which a
    * LIMIT 1 would break. The max is one broadcast scalar; the
    * revenue aggregate is computed ONCE and reused for both sides.
    * Revenue is rounded to cents BEFORE the max-equality compare so
    * the tie test is exact arithmetic, not double-ulp luck. */
  def qTpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lit("1997-07-01") &&
        col("l_shipdate") < lit("1997-10-01"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(broadcast(t(s, dir)("supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    * three brand/size/quantity conjunctions OR-ed together. The part
    * dim broadcasts; the OR's common structure means Catalyst can
    * extract `p_size >= 1` and the quantity range [1,30] as
    * scan-level prefilters while the full disjunction runs post-join
    * — lineitem never shuffles. */
  def qTpchQ19(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir)("lineitem")
    val p = t(s, dir)("part").select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** TPC-H Q16 shape (part/supplier relationship counting): distinct
    * supplier count per part attribute, with a NOT-IN supplier
    * exclusion compiled as a LEFT ANTI join (the subquery is
    * null-free, so anti join is exact). The lineitem fact is the
    * part↔supplier link (testdata has no partsupp); the distinct
    * aggregate runs two-phase — partial distinct inside each
    * partition before the exchange — so the shuffle carries unique
    * (brand, size, suppkey) triples, not raw lines. */
  def qTpchQ16(s: SparkSession, dir: String): DataFrame = {
    val bad = t(s, dir)("supplier").filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    val p = t(s, dir)("part")
      .filter(col("p_brand") =!= "Brand#12" &&
        col("p_size").isin(1, 5, 9, 13))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    t(s, dir)("lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    * EXISTS + NOT EXISTS pair over the same fact table. The textbook
    * compilation ([[qTpchQ21SemiAnti]], spec-pinned identical) runs a
    * LEFT SEMI then a LEFT ANTI self-join — THREE full-fact shuffles,
    * measured 77.9 s at 100×/8 cpus. The registered form exploits
    * that both subqueries are per-order set predicates: for a probe
    * line (order o, supplier s, flag R), "exists another supplier" ⇔
    * |suppliers(o)| ≥ 2, and "no OTHER supplier failed" ⇔
    * |failing-suppliers(o)| = 1 (s itself is failing, so the
    * singleton must be s). One distinct-aggregate over lineitem
    * computes both counts — the two EXISTS collapse into a single
    * semi join against a one-row-per-order table, eliminating a full
    * self-join shuffle AND the non-equi residual skew. Testdata has
    * no commit/receipt dates, so "failed" is the returned-flag line. */
  def qTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir)("lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    // two-level aggregation, NOT countDistinct: two distinct aggs
    // over different children compile to an Expand that doubles the
    // shuffled row count (measured 205 s at 100× vs 78 s textbook).
    // Collapsing to (order, supplier) pairs first is map-side
    // combinable (an order's lines are file-adjacent), then the
    // per-order counts aggregate one row per pair.
    val pairs = li.groupBy(col("l_orderkey").as("ok"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
        .as("failed"))
    val perOrder = pairs.groupBy(col("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("failed")).as("n_fail"))
      .filter(col("n_supp") >= 2 && col("n_fail") === 1)
      .select(col("ok"))
    li.filter(col("l_returnflag") === "R")
      .join(t(s, dir)("orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(perOrder, col("l_orderkey") === col("ok"), "left_semi")
      .join(broadcast(t(s, dir)("supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  /** The textbook EXISTS/NOT-EXISTS compilation of Q21 — LEFT SEMI +
    * LEFT ANTI self-joins with the supplier-differs residual. Kept as
    * the plan-shape exhibit (PlanAuditSpec pins the semi+anti
    * compilation; OperatorsSpec pins it row-identical to the
    * aggregate rewrite the registry runs). */
  def qTpchQ21SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir)("lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val l1 = li.filter(col("l_returnflag") === "R")
      .join(t(s, dir)("orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
    val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("k2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .join(broadcast(t(s, dir)("supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  /** TPC-H Q22 shape (global sales opportunity): customers above the
    * average balance with NO orders — a scalar-subquery broadcast
    * (the avg) plus a LEFT ANTI join against orders. The anti join
    * probes with the already-filtered customer slice, so at 100 TB
    * the shuffle carries only above-average customers of the target
    * segments; market segment stands in for the spec's phone prefix. */
  def qTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")
    val c = t(s, dir)("customer").filter(col("c_mktsegment").isin(segs: _*))
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("ab"))
    c.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
      .join(t(s, dir)("orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
  }

  def qTpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir)("lineitem").groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    val o = t(s, dir)("orders")
    val c = t(s, dir)("customer")
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("sum_qty"), 2).as("total_qty"))
  }

  /** Keep-latest-per-key dedup (row_number = 1): THE warehouse dedup
    * idiom — one shuffle on the key; at scale this is how snapshots
    * collapse a CDC/append log. Full tie-break makes it deterministic. */
  def qDedupLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir)("orders")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
  }

  /** Ordered string aggregation (listagg/string_agg): sorted
    * collect_list keeps partial-aggregation order from leaking into
    * the result — parallelism-stable on both engines. */
  def qStringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders").groupBy(col("o_custkey"))
      .agg(array_join(array_sort(collect_list(col("o_orderstatus"))), ",")
        .as("statuses"))

  /** ntile quartiles over a full tie-broken ordering. */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir)("orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      ntile(4).over(w).as("quartile"))
  }

  /** Distribution windows: percent_rank and cume_dist of customer
    * balance within nation — exact small-rational divisions, so both
    * engines agree bit-for-bit after the shared rounding. */
  def qWindowCume(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir)("customer").select(
      col("c_custkey"), col("c_nationkey"),
      round(percent_rank().over(w), 4).as("pr"),
      round(cume_dist().over(w), 4).as("cd"))
  }

  /** Semi-structured extraction: the events `props` column is a JSON
    * string; parse it ONCE per row with an explicit schema (from_json
    * — codegen'd, no inference pass over 100 TB) and aggregate the
    * extracted field. The DuckDB oracle states the same extraction
    * with a regex, so the gate pins the parsed VALUES, not a parser
    * implementation. */
  def qJsonProps(s: SparkSession, dir: String): DataFrame = {
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
      .getField("k")
    t(s, dir)("events")
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_json_props" -> (qJsonProps _),
    "x_window_cume" -> (qWindowCume _),
    "x_tpch_q18" -> (qTpchQ18 _),
    "x_dedup_latest" -> (qDedupLatest _),
    "x_string_agg" -> (qStringAgg _),
    "x_ntile" -> (qNtile _),
    "x_having" -> (qHaving _),
    "x_window_range" -> (qWindowRange _),
    "x_string2" -> (qString2 _),
    "x_date2" -> (qDate2 _),
    "x_math2" -> (qMath2 _),
    "x_tpch_q5" -> (qTpchQ5 _),
    "x_tpch_q10" -> (qTpchQ10 _),
    "x_tpch_q3" -> (qTpchQ3 _),
    "x_tpch_q6" -> (qTpchQ6 _),
    "x_tpch_q4" -> (qTpchQ4 _),
    "x_tpch_q7" -> (qTpchQ7 _),
    "x_tpch_q8" -> (qTpchQ8 _),
    "x_tpch_q12" -> (qTpchQ12 _),
    "x_tpch_q13" -> (qTpchQ13 _),
    "x_tpch_q14" -> (qTpchQ14 _),
    "x_tpch_q15" -> (qTpchQ15 _),
    "x_tpch_q16" -> (qTpchQ16 _),
    "x_tpch_q17" -> (qTpchQ17 _),
    "x_tpch_q19" -> (qTpchQ19 _),
    "x_tpch_q21" -> (qTpchQ21 _),
    "x_tpch_q22" -> (qTpchQ22 _),
    "x_approx" -> (qApprox _),
    "x_cube" -> (qCube _),
    "x_grouping_sets" -> (qGroupingSets _),
    "x_lag_lead" -> (qLagLead _),
    "x_ranks" -> (qRanks _),
    "x_first_last" -> (qFirstLast _),
    "x_percentile" -> (qPercentile _),
    "x_pivot" -> (qPivot _),
    "x_unpivot" -> (qUnpivot _),
    "x_outer_join" -> (qOuterJoin _),
    "x_full_outer" -> (qFullOuter _),
    "x_cross_join" -> (qCrossJoin _),
    "x_in_subquery" -> (qInSubquery _),
    "x_correlated_subquery" -> (qCorrelatedSubquery _),
    "x_union_all" -> (qUnionAll _),
    "x_intersect" -> (qIntersect _),
    "x_null_funcs" -> (qNullFuncs _))

  val oracle: Map[String, String] = Map(
    "x_tpch_q18" ->
      "SELECT c_custkey, c_name, o_orderkey, round((sum_qty)*1e2)/1e2 AS total_qty FROM orders JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big ON o_orderkey = l_orderkey JOIN customer ON o_custkey = c_custkey",
    "x_dedup_latest" ->
      "SELECT o_custkey, o_orderkey, round((o_totalprice)*1e2)/1e2 AS price FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1",
    "x_string_agg" ->
      "SELECT o_custkey, string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses FROM orders GROUP BY o_custkey",
    "x_ntile" ->
      "SELECT o_orderkey, o_orderstatus, CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile FROM orders",
    "x_window_cume" ->
      "SELECT c_custkey, c_nationkey, round((percent_rank() OVER w)*1e4)/1e4 AS pr, round((cume_dist() OVER w)*1e4)/1e4 AS cd FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)",
    "x_json_props" ->
      """SELECT event_type, count(*) AS n, CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k, CAST(max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS max_k FROM events GROUP BY event_type""",
    "x_having" ->
      "SELECT l_partkey, count(*) AS n, round((sum(l_quantity))*1e2)/1e2 AS qty FROM lineitem GROUP BY l_partkey HAVING count(*) >= 45",
    "x_window_range" ->
      "SELECT o_orderkey, count(*) OVER (PARTITION BY o_orderstatus ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING) AS n_similar FROM orders",
    "x_string2" ->
      "SELECT p_partkey, replace(p_name, ' ', '_') AS name_snake, lpad(p_brand, 12, '*') AS brand_pad, split_part(p_type, ' ', 1) AS type_first, reverse(p_brand) AS brand_rev FROM part",
    "x_date2" ->
      "SELECT o_orderkey, strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m, date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002, CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow, CAST(quarter(o_orderdate) AS INTEGER) AS qtr FROM orders",
    "x_math2" ->
      "SELECT l_orderkey, l_linenumber, round((pow(l_discount + 1, 3))*1e6)/1e6 AS disc_pow, round((exp(l_discount))*1e6)/1e6 AS disc_exp, l_partkey % 7 AS pk_mod, CAST(sign(l_discount - 0.05) AS INTEGER) AS d_sign, greatest(l_quantity, l_discount * 100) AS g, least(l_tax, l_discount) AS l FROM lineitem",
    "x_tpch_q5" ->
      "SELECT n_name, round((sum(l_extendedprice*(1-l_discount)))*1e2)/1e2 AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' AND o_orderstatus != 'P' GROUP BY n_name",
    "x_tpch_q10" ->
      "SELECT c_custkey, c_name, round((sum(l_extendedprice*(1-l_discount)))*1e2)/1e2 AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE l_returnflag = 'R' GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 20",
    "x_tpch_q3" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, round((sum(l_extendedprice*(1-l_discount)))*1e2)/1e2 AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_orderpriority = '1-URGENT' AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01' GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10",
    "x_tpch_q6" ->
      "SELECT round((sum(l_extendedprice*l_discount))*1e2)/1e2 AS revenue FROM lineitem WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01' AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24",
    "x_tpch_q4" ->
      "SELECT o_orderpriority, count(*) AS n FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01' AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) GROUP BY o_orderpriority",
    "x_tpch_q12" ->
      "SELECT l_returnflag, CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY l_returnflag",
    "x_tpch_q14" ->
      "SELECT round((100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) / sum(l_extendedprice*(1-l_discount)))*1e4)/1e4 AS promo_revenue FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'",
    "x_tpch_q17" ->
      "SELECT round((sum(l_extendedprice) / 7.0)*1e2)/1e2 AS avg_yearly FROM lineitem JOIN part ON p_partkey = l_partkey WHERE p_size <= 5 AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)",
    "x_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         round((sum(l_extendedprice*(1-l_discount)))*1e2)/1e2 AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         GROUP BY 1, 2, 3""",
    "x_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         round((sum(CASE WHEN n1.n_name = 'NATION_5' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END)
           / sum(l_extendedprice*(1-l_discount)))*1e6)/1e6 AS mkt_share
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         JOIN region ON n2.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         WHERE r_name = 'ASIA'
         GROUP BY 1""",
    "x_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         GROUP BY c_count""",
    "x_tpch_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey,
             round((sum(l_extendedprice*(1-l_discount)))*1e2)/1e2 AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-07-01' AND l_shipdate < TIMESTAMP '1997-10-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
    "x_tpch_q16" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#12' AND p_size IN (1, 5, 9, 13)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         GROUP BY p_brand, p_size""",
    "x_tpch_q19" ->
      """SELECT round((sum(l_extendedprice*(1-l_discount)))*1e2)/1e2 AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
    "x_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
         FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
         JOIN supplier ON l1.l_suppkey = s_suppkey
         WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_returnflag = 'R')
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "x_tpch_q22" ->
      """SELECT c_mktsegment AS segment, count(*) AS numcust,
         round((sum(c_acctbal))*1e2)/1e2 AS totacctbal
         FROM customer
         WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
           AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
             WHERE c_acctbal > 0.0
               AND c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",
    "x_cube" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
    "x_grouping_sets" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())",
    "x_lag_lead" ->
      "SELECT o_custkey, o_orderkey, round((lag(o_totalprice, 1) OVER w)*1e2)/1e2 AS prev_price, round((lead(o_totalprice, 1) OVER w)*1e2)/1e2 AS next_price FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)",
    "x_ranks" ->
      "SELECT l_returnflag, l_orderkey, l_linenumber, CAST(rank() OVER w AS INTEGER) AS rnk, CAST(dense_rank() OVER w AS INTEGER) AS drnk, round((percent_rank() OVER w)*1e6)/1e6 AS prnk FROM lineitem WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)",
    "x_first_last" ->
      "SELECT o_custkey, o_orderkey, first_value(o_orderkey) OVER w AS first_order, last_value(o_orderkey) OVER w AS last_order FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    "x_percentile" ->
      "SELECT o_orderstatus, round((quantile_cont(o_totalprice, 0.5))*1e2)/1e2 AS p50, round((quantile_cont(o_totalprice, 0.9))*1e2)/1e2 AS p90 FROM orders GROUP BY o_orderstatus",
    // exact values restated in SQL; the tolerance booleans are TRUE
    // literals — the Spark side computes them from its sketches, so a
    // sketch drifting past 5% breaks the hash and fails the gate
    "x_approx" ->
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, round((quantile_cont(l_extendedprice, 0.5))*1e2)/1e2 AS exact_p50, TRUE AS parts_within_5pct, TRUE AS p50_within_5pct FROM lineitem GROUP BY l_returnflag",
    "x_pivot" ->
      "SELECT o_custkey, count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open, count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished, count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending FROM orders GROUP BY o_custkey",
    // the relational definition of melt: one UNION ALL branch per
    // measure (same rows the Expand emits, engine-neutral)
    "x_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, round((l_quantity)*1e2)/1e2 AS value FROM lineitem
         UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', round((l_extendedprice)*1e2)/1e2 FROM lineitem
         UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', round((l_discount)*1e2)/1e2 FROM lineitem
         UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', round((l_tax)*1e2)/1e2 FROM lineitem""",
    "x_outer_join" ->
      "SELECT p_partkey, coalesce(n_lines, 0) AS n_lines FROM (SELECT l_partkey, count(*) AS n_lines FROM lineitem GROUP BY l_partkey) li RIGHT JOIN part ON l_partkey = p_partkey",
    "x_full_outer" ->
      "SELECT coalesce(a.k, b.k) AS k, coalesce(n_open, 0) AS n_open, coalesce(n_fin, 0) AS n_fin FROM (SELECT o_custkey AS k, count(*) AS n_open FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) a FULL OUTER JOIN (SELECT o_custkey AS k, count(*) AS n_fin FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) b ON a.k = b.k",
    "x_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "x_in_subquery" ->
      "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)",
    "x_correlated_subquery" ->
      "SELECT o_orderkey, round((SELECT sum(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey)*1e2)/1e2 AS total_qty FROM orders WHERE o_orderkey < 1000",
    "x_union_all" ->
      "SELECT o_custkey, count(*) AS n FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' UNION ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') GROUP BY o_custkey",
    "x_intersect" ->
      "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'",
    "x_null_funcs" ->
      "SELECT c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other, CASE WHEN c_acctbal > 0 THEN 'pos' WHEN c_acctbal < 0 THEN 'neg' ELSE 'zero' END AS bal_sign FROM customer")
}
