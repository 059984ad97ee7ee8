package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset profiling — the per-column summary (rows, nulls, distinct
  * count, min/max, mean rendered length) a pipeline runs before
  * trusting a new drop of training data. ONE pass over the table: all
  * columns' aggregates go into a single `agg` (Catalyst plans the
  * multi-distinct via one Expand — still a single scan), and the
  * 1×(6·k) result row is reshaped to long form with `stack`, which is
  * driver-free and keeps the whole profile inside the same job.
  *
  * Values are profiled through their canonical string rendering so
  * one schema fits every column type; renderings are engine-identical
  * for the integer/string columns profiled here (doubles would not
  * be — callers profile those via dedicated numeric stats). At 100 TB
  * the only change worth making is `approx_count_distinct` instead of
  * the exact multi-distinct Expand; the scan count stays 1 either
  * way.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(count(s).as(s"${c}__cnt"),
        countDistinct(s).as(s"${c}__nd"),
        min(s).as(s"${c}__min"),
        max(s).as(s"${c}__max"),
        avg(length(s)).as(s"${c}__len"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val groups = cols.map(c =>
      s"'$c', n_rows - `${c}__cnt`, `${c}__nd`, `${c}__min`, `${c}__max`, round(`${c}__len` * 1e4) / 1e4")
    wide.select(col("n_rows"), expr(
      s"stack(${cols.size}, ${groups.mkString(", ")}) AS " +
        "(column_name, n_nulls, n_distinct, min_s, max_s, avg_len)"))
  }

  // ------------------------------------------------------- queries //

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_profile" -> ((s, dir) =>
      profile(Tables.load(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))))

  private def colSql(c: String): String =
    s"SELECT '$c' AS column_name, count(*) AS n_rows, " +
    s"count(*) - count($c) AS n_nulls, " +
    s"count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct, " +
    s"min(CAST($c AS VARCHAR)) AS min_s, max(CAST($c AS VARCHAR)) AS max_s, " +
    s"round(avg(length(CAST($c AS VARCHAR))) * 1e4) / 1e4 AS avg_len " +
    "FROM documents"

  val oracle: Map[String, String] = Map(
    "c_profile" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(colSql).mkString(" UNION ALL "))
}
