package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H supply-side battery (Q2 / Q9 / Q11 / Q20) over a DERIVED
  * `partsupp` relation — testdata ships no partsupp table, so one is
  * derived deterministically from `part` × {0..3} with pure integer
  * arithmetic that Spark and DuckDB evaluate identically:
  *
  *   ps_suppkey    = (p_partkey·7 + i·13) mod |supplier|     (i ∈ 0..3)
  *   ps_availqty   = (ps_partkey·13 + ps_suppkey·17) mod 9999 + 1
  *   ps_supplycost = ((ps_partkey·31 + ps_suppkey·7) mod 100000 + 100) / 100.0
  *
  * availqty/supplycost are functions of the (partkey, suppkey) PAIR, so
  * the DISTINCT that enforces the TPC-H primary key cannot create
  * conflicting duplicates even if two i-offsets collide mod |supplier|.
  * Both engines compute the same eight-thousand-row relation from the
  * same parquet inputs; the oracle restates the derivation as a CTE.
  *
  * Missing reference columns are restated per the battery convention
  * (COVERAGE.md): Q2 projects p_brand for p_mfgr, Q20 projects
  * s_suppkey for s_address; ship-mode/comment predicates are restated
  * onto columns that exist (scaladoc per query names the substitution).
  *
  * Scale notes (100 TB): partsupp is 0.8M rows/SF in real TPC-H — a
  * fact-sized relation. Every query below therefore (a) pushes its
  * part/supplier filters into the smallest relation FIRST and
  * broadcasts only genuinely dim-sized sides (region-qualified
  * suppliers, name-filtered part keys), (b) keeps the per-part min /
  * per-pair sum aggregations as partial-agg shuffles on the join key
  * they feed, so the join-back lands co-partitioned, and (c) ends
  * top-k queries in TakeOrderedAndProject (plan-pinned).
  */
object TpchSupply {

  private def round2(c: Column): Column = Relational.round(c, 2)

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The derivation over an arbitrary part slice. Because each part's
    * supply rows depend on nothing but that part's key, a query that
    * filters parts can derive partsupp from the FILTERED slice — the
    * pushed-down form every query below except Q11 uses, which keeps
    * the 4× expansion (and its DISTINCT exchange) dim-sized instead of
    * partsupp-sized. */
  def partsuppOf(part: DataFrame, supplier: DataFrame): DataFrame = {
    // |supplier| as a broadcast scalar: one row crossed onto part —
    // no driver-side collect, no shuffle.
    val nSupp = broadcast(supplier.agg(count(lit(1)).as("n_supp")))
    part.select(col("p_partkey"))
      .crossJoin(nSupp)
      .select(col("p_partkey"),
        explode(array((0 to 3).map(lit): _*)).as("i"), col("n_supp"))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 7 + col("i") * 13) % col("n_supp")).as("ps_suppkey"))
      .distinct()
      .select(col("ps_partkey"), col("ps_suppkey"),
        ((col("ps_partkey") * 13 + col("ps_suppkey") * 17) % 9999 + 1)
          .as("ps_availqty"),
        (((col("ps_partkey") * 31 + col("ps_suppkey") * 7) % 100000 + 100) / 100.0)
          .as("ps_supplycost"))
  }

  /** The full relation, shared by Q11 (oracle: [[psCte]]). */
  def partsupp(s: SparkSession, dir: String): DataFrame =
    partsuppOf(t(s, dir)("part"), t(s, dir)("supplier"))

  /** TPC-H Q2 (minimum-cost supplier): for STANDARD parts of size ≤ 15,
    * the EUROPE supplier(s) whose cost equals the per-part minimum over
    * EUROPE. The correlated `= (SELECT min ...)` compiles as a per-part
    * min aggregate joined back on (partkey, cost) — both the aggregate
    * and the join-back shuffle on ps_partkey, so the second join lands
    * co-partitioned; ties keep ALL minimum-cost suppliers, exactly the
    * SQL semantics. Region-qualified suppliers broadcast (dim-sized
    * even at 100 TB: 10k suppliers/SF). p_brand stands in for the
    * missing p_mfgr. */
  def qTpchQ2(s: SparkSession, dir: String): DataFrame = {
    val euroNations = t(s, dir)("nation")
      .join(broadcast(t(s, dir)("region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val euroSupp = broadcast(
      t(s, dir)("supplier").join(broadcast(euroNations),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val parts = broadcast(
      t(s, dir)("part")
        .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_brand")))
    // region-qualified supply derived from the FILTERED part slice —
    // sound because the correlated min ranges over suppliers of the
    // same part, never over other parts
    val qualified = partsuppOf(
        t(s, dir)("part").filter(col("p_size") <= 15 && col("p_type") === "STANDARD"),
        t(s, dir)("supplier"))
      .join(euroSupp, col("ps_suppkey") === col("s_suppkey"))
      .join(parts, col("ps_partkey") === col("p_partkey"))
    val minCost = qualified.groupBy(col("ps_partkey").as("mk"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    qualified.join(minCost,
        col("ps_partkey") === col("mk") && col("ps_supplycost") === col("min_cost"))
      .select(round2(col("s_acctbal")).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_brand"),
        round2(col("ps_supplycost")).as("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9 (product-type profit): per (nation, year) profit where
    * profit = revenue − supply cost, for parts whose name contains
    * 'red'. Join order is slice-first: the name-filtered part keys
    * broadcast into lineitem AND into partsupp before any fact-fact
    * shuffle, so the (l_partkey, l_suppkey) = (ps_partkey, ps_suppkey)
    * join carries only qualifying rows; orders joins last on the
    * already-reduced fact. At 100 TB the '%red%' slice is ~1/17 of
    * parts — if it outgrew the broadcast threshold AQE would fall back
    * to a shuffled semi, same row-reduction, one more exchange. */
  def qTpchQ9(s: SparkSession, dir: String): DataFrame = {
    val redParts = t(s, dir)("part").filter(col("p_name").like("%red%"))
    val ps = broadcast(
      partsuppOf(redParts, t(s, dir)("supplier"))
        .select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost")))
    val suppNation = broadcast(
      t(s, dir)("supplier")
        .join(broadcast(t(s, dir)("nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
    t(s, dir)("lineitem")
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir)("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity"))).as("sum_profit"))
  }

  /** TPC-H Q11 (important stock): per-part stock value held by
    * NATION_7 suppliers, kept where the part's value exceeds 0.5% of
    * the nation's total. The scalar total rides in as a broadcast
    * 1-row cross join — the grouped side never re-shuffles; the
    * nation-filtered supplier set broadcasts into partsupp so the only
    * exchange is the partial-agg shuffle on ps_partkey. */
  def qTpchQ11(s: SparkSession, dir: String): DataFrame = {
    val supp7 = broadcast(
      t(s, dir)("supplier")
        .join(broadcast(t(s, dir)("nation").filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
    val psv = partsupp(s, dir)
      .join(supp7, col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost") * col("ps_availqty")).as("v"))
    val total = broadcast(psv.agg(sum(col("v")).as("total_v")))
    psv.groupBy(col("ps_partkey")).agg(sum(col("v")).as("raw_value"))
      .crossJoin(total)
      // BOTH filter operands on the shared 1e2 rounding grid (the
      // battery's convention, cf. Q15): comparing raw double sums
      // lets partial-aggregation order flip a boundary row vs the
      // single-node oracle (code-review r10)
      .filter(round2(col("raw_value")) > round2(col("total_v") * 0.005))
      .select(col("ps_partkey"), round2(col("raw_value")).as("value"))
  }

  /** TPC-H Q20 (potential part promotion): NATION_6 suppliers whose
    * stock of any 'small%' part exceeds half of what they shipped of
    * that part in 1997. The correlated `> (SELECT 0.5*sum ...)`
    * compiles as: date-sliced lineitem, semi-reduced to qualifying
    * parts BEFORE the (partkey, suppkey) partial-agg shuffle, inner-
    * joined back to partsupp (SQL's NULL-scalar comparison drops
    * pairs with no 1997 shipments — inner join is the exact
    * semantics). s_suppkey stands in for the missing s_address. */
  def qTpchQ20(s: SparkSession, dir: String): DataFrame = {
    val smallParts = broadcast(
      t(s, dir)("part").filter(col("p_name").like("small%")).select(col("p_partkey")))
    val psQ = partsuppOf(
        t(s, dir)("part").filter(col("p_name").like("small%")),
        t(s, dir)("supplier"))
      .select(col("ps_partkey"), col("ps_suppkey"), col("ps_availqty"))
    val shipped = t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty_1997"))
    val qualSupp = psQ
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > col("qty_1997") * 0.5)
      .select(col("ps_suppkey")).distinct()
    t(s, dir)("supplier")
      .join(broadcast(t(s, dir)("nation").filter(col("n_name") === "NATION_6")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualSupp, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_suppkey"))
      .orderBy(col("s_name"))
  }

  /** The derivation as a DuckDB CTE — prefixed onto every oracle. */
  private val psCte: String =
    """WITH ps0 AS (
         SELECT DISTINCT p_partkey AS ps_partkey,
           (p_partkey*7 + i*13) % (SELECT count(*) FROM supplier) AS ps_suppkey
         FROM part CROSS JOIN (SELECT unnest([0,1,2,3]) AS i)),
       partsupp AS (
         SELECT ps_partkey, ps_suppkey,
           (ps_partkey*13 + ps_suppkey*17) % 9999 + 1 AS ps_availqty,
           ((ps_partkey*31 + ps_suppkey*7) % 100000 + 100) / 100.0 AS ps_supplycost
         FROM ps0)
    """

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_tpch_q2" -> (qTpchQ2 _),
    "x_tpch_q9" -> (qTpchQ9 _),
    "x_tpch_q11" -> (qTpchQ11 _),
    "x_tpch_q20" -> (qTpchQ20 _))

  val oracle: Map[String, String] = Map(
    "x_tpch_q2" -> (psCte +
      """SELECT round((s_acctbal)*1e2)/1e2 AS s_acctbal, s_name, n_name, p_partkey,
           p_brand, round((ps_supplycost)*1e2)/1e2 AS ps_supplycost
         FROM part JOIN partsupp ON p_partkey = ps_partkey
         JOIN supplier ON s_suppkey = ps_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
           AND ps_supplycost = (SELECT min(ps2.ps_supplycost) FROM partsupp ps2
             JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
             JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
             JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
             WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""),
    "x_tpch_q9" -> (psCte +
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round((sum(l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity))*1e2)/1e2 AS sum_profit
         FROM lineitem JOIN partsupp
           ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         JOIN part ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2"""),
    "x_tpch_q11" -> (psCte +
      """SELECT ps_partkey, round((sum(ps_supplycost*ps_availqty))*1e2)/1e2 AS value
         FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_7'
         GROUP BY ps_partkey
         HAVING round((sum(ps_supplycost*ps_availqty))*1e2)/1e2 > (
           SELECT round((sum(ps_supplycost*ps_availqty)*0.005)*1e2)/1e2 FROM partsupp
           JOIN supplier ON ps_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_7')"""),
    "x_tpch_q20" -> (psCte +
      """SELECT s_name, s_suppkey
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_6' AND s_suppkey IN (
           SELECT ps_suppkey FROM partsupp
           WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
             AND ps_availqty > (SELECT 0.5*sum(l_quantity) FROM lineitem
               WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                 AND l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate < TIMESTAMP '1998-01-01'))
         ORDER BY s_name"""))
}
