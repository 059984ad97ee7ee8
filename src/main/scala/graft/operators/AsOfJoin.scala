package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward, inclusive) join — for each left row, the single
  * right row with the greatest timestamp ≤ the left timestamp, within
  * the same key group.
  *
  * Spark has no native as-of join. The naive composition (equi-join on
  * key + range filter + argmax) materializes |L|×|R per key| rows
  * before reducing — quadratic in hot keys. This operator uses the
  * union-sort formulation instead:
  *
  *   1. tag left (probe) and right (reference) rows, union them;
  *   2. one window over (keys..., ts, side) — right rows sort before
  *      probe rows at equal ts, giving inclusive `>=` semantics;
  *   3. `last(rightPayload, ignoreNulls)` up to the current row
  *      carries the most recent reference row forward;
  *   4. keep probe rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key, linear in group
  * size — the formulation that survives hot keys at 100 TB. (A
  * custom SparkPlan could fuse step 2-4, but the window already
  * executes as a single sort+scan per partition, so there's nothing
  * left to win.)
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side
    * @param keys       equi-key column names present on both sides
    * @param leftTs     probe timestamp column name
    * @param rightTs    reference timestamp column name
    * @param rightCols  reference columns to carry (renamed as given:
    *                   (srcName, outName))
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[(String, String)]): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct(rightCols.map { case (src, out) =>
      col(src).as(out) }: _*)

    val l = left.select(
      keyCols ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(left.columns.map(col): _*).as("_l"),
        lit(null).cast(payloadType(right, rightCols)).as("_r")): _*)
    val r = right.select(
      keyCols ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(structType(left)).as("_l"),
        payload.as("_r")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +: rightCols.map { case (_, out) =>
        col(s"_match.$out").as(out) }: _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  private def payloadType(df: DataFrame, cols: Seq[(String, String)]) =
    org.apache.spark.sql.types.StructType(cols.map { case (src, out) =>
      df.schema(src).copy(name = out) })
}
