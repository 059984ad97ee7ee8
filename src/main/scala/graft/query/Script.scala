package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-statement script execution with shared variables — the
  * re-expression of the reference's `filter.surql` script surface
  * (SURVEY §2.B B12 LET / B13 RETURN / B18 multi-statement):
  *
  * {{{
  *   LET del = SELECT id FROM entities WHERE ...;
  *   LET keep = SELECT * FROM entities ANTI JOIN del USING (id);
  *   RETURN SELECT count(*) FROM keep;
  * }}}
  *
  * `LET x = <sql>` binds the statement's result as temp view `x`
  * (lazily — a view is a named plan, exactly SurrealQL's `$var`
  * semantics without materialization); `RETURN <sql>` (or a bare
  * final statement) yields the result. Statements split on `;` at
  * top level (quote-aware).
  */
object Script {

  def run(spark: SparkSession, script: String): DataFrame = {
    val statements = split(script).map(_.trim).filter(_.nonEmpty)
    require(statements.nonEmpty, "empty script")
    var last: Option[DataFrame] = None
    val letRe = "(?is)^LET\\s+([a-zA-Z_][a-zA-Z0-9_]*)\\s*=\\s*(.+)$".r
    val retRe = "(?is)^RETURN\\s+(.+)$".r
    val created = Seq.newBuilder[String]
    statements.foreach {
      case letRe(name, sql) =>
        spark.sql(sql).createOrReplaceTempView(name)
        created += name
      case retRe(sql) =>
        last = Some(spark.sql(sql))
      case sql =>
        last = Some(spark.sql(sql))
    }
    val result = last.getOrElse(throw new IllegalArgumentException(
      "script has no RETURN / result statement"))
    // LET bindings are SCRIPT-scoped: every statement (including the
    // result) is already analyzed, so dropping the views now cannot
    // affect execution — leaving them registered leaked bindings into
    // the shared session, where a later unrelated query named `keep`
    // would silently resolve to this script's stale result
    // (code-review r10)
    created.result().foreach(spark.catalog.dropTempView)
    result
  }

  /** Registry gate for the script surface (SURVEY §2.B B12 LET /
    * B13 RETURN / B18 multi-statement): the interpreter's relational
    * core — LET → named lazy view, IN-subselect semi + NOT-IN anti,
    * GROUP BY, ORDER/LIMIT, RETURN — run over the DuckDB-loadable
    * testdata tables so the driver's hash gate covers it (the
    * verbatim-SurrealQL surface stays pinned by SurrealQLSpec over
    * the Wikidata fixtures, which the oracle harness doesn't load).
    * The oracle restates the SAME statements as one CTE query.
    * Money sums ride the integer-cent device (per-row
    * round(x*1e2)→BIGINT, integer sums, one final /1e2): at the 100×
    * rehearsal the old double-sum total straddled its 2-dec rounding
    * boundary by 1 ulp across 270k customers per segment (the
    * q_join_agg class, PERF_r11) — integer addition is associative,
    * so the cent form is exact at any scale. */
  private val gateScript =
    """LET spend = SELECT o_custkey,
      |  sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS spent_c
      |  FROM orders GROUP BY o_custkey;
      |LET active = SELECT c_custkey, c_mktsegment FROM customer
      |  WHERE c_custkey IN (SELECT o_custkey FROM orders);
      |LET keep = SELECT * FROM active
      |  WHERE c_custkey NOT IN
      |    (SELECT c_custkey FROM customer WHERE c_acctbal < 0);
      |RETURN SELECT c_mktsegment, count(*) AS n_cust,
      |  sum(s.spent_c) / 1e2 AS total_spent
      |  FROM keep k JOIN spend s ON k.c_custkey = s.o_custkey
      |  GROUP BY c_mktsegment ORDER BY c_mktsegment LIMIT 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b18_script" -> ((s, dir) => {
      Seq("customer", "orders").foreach(t =>
        graft.sources.Tables.load(s, dir, t).createOrReplaceTempView(t))
      run(s, gateScript)
    }))

  val oracle: Map[String, String] = Map(
    "b18_script" ->
      """WITH spend AS (SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS spent_c
        |    FROM orders GROUP BY o_custkey),
        |  active AS (SELECT c_custkey, c_mktsegment FROM customer
        |    WHERE c_custkey IN (SELECT o_custkey FROM orders)),
        |  keep AS (SELECT * FROM active
        |    WHERE c_custkey NOT IN
        |      (SELECT c_custkey FROM customer WHERE c_acctbal < 0))
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  sum(s.spent_c) / 1e2 AS total_spent
        |FROM keep k JOIN spend s ON k.c_custkey = s.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment LIMIT 3""".stripMargin)

  /** Quote-aware top-level `;` split. Inside a literal, a backslash
    * escapes the next character (Spark SQL's `'don\'t; x'`), so an
    * escaped quote does NOT close the literal and a `;` after it
    * stays inside — the unescaped version split such scripts
    * mid-literal (code-review r10). */
  private[graft] def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == '\\' && i + 1 < script.length) {
          cur += script.charAt(i + 1); i += 1
        } else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case ';' => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }
}
