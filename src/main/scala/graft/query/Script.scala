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
    statements.foreach {
      case letRe(name, sql) =>
        spark.sql(sql).createOrReplaceTempView(name)
      case retRe(sql) =>
        last = Some(spark.sql(sql))
      case sql =>
        last = Some(spark.sql(sql))
    }
    last.getOrElse(throw new IllegalArgumentException(
      "script has no RETURN / result statement"))
  }

  /** Quote-aware top-level `;` split. */
  private[graft] def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) quote = 0
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
