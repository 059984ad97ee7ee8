package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.query.Script

/** B12/B13/B18: multi-statement scripts with LET variables — the
  * `filter.surql` surface in SQL form. */
class ScriptSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("LET / RETURN script reproduces the test_filter shape") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    // orders-without-lineitems playing the "entities lacking P1113" role
    val out = Script.run(spark,
      """LET del = SELECT o_orderkey FROM orders
        |          WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey);
        |LET kept = SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del);
        |RETURN SELECT count(*) AS n FROM kept""".stripMargin)
    val n = out.collect()(0).getLong(0)
    val expected = spark.sql(
      """SELECT count(*) FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === expected && n > 0)
  }

  test("backslash-escaped quote inside a literal doesn't close it") {
    val out = Script.run(spark, "SELECT 'don\\'t; x' AS s")
    assert(out.collect()(0).getString(0) === "don't; x")
  }

  test("LET bindings are script-scoped: views dropped after run") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    Script.run(spark,
      "LET leak_probe = SELECT 1 AS one; RETURN SELECT * FROM leak_probe")
      .collect()
    assert(!spark.catalog.tableExists("leak_probe"),
      "LET view leaked into the shared session")
  }

  test("quoted semicolons don't split statements") {
    assert(Script.split("SELECT ';' AS a; SELECT 1").map(_.trim)
      .filter(_.nonEmpty) === Seq("SELECT ';' AS a", "SELECT 1"))
  }

  test("bare final SELECT is the result; empty script rejected") {
    val df = Script.run(spark, "SELECT 42 AS v")
    assert(df.collect()(0).getInt(0) === 42)
    intercept[IllegalArgumentException](Script.run(spark, "  ;  "))
  }
}
