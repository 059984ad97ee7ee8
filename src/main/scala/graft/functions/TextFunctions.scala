package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Tables

/** The reference's full-text analyzer (SURVEY §2.B B17):
  * `DEFINE ANALYZER blank_english TOKENIZERS blank FILTERS lowercase,
  * ascii, snowball(english)` — as native Catalyst expressions:
  *
  *   - blank tokenizer  → `split(text, "\\s+")`
  *   - lowercase filter → built-in `lower`
  *   - ascii filter     → [[AsciiFold]] (NFD decomposition + strip of
  *     combining marks — Unicode-correct accent folding)
  *   - snowball filter  → [[SnowballStem]] over [[Porter2]]
  *
  * Both custom expressions are null-intolerant unary string kernels;
  * CodegenFallback keeps them correct everywhere while the
  * surrounding pipeline (split/lower/transform) stays codegen'd —
  * they're per-token scalar calls, not the scan hot path.
  */
object TextFunctions {

  case class AsciiFold(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val folded = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", "")
      UTF8String.fromString(folded)
    }
    override protected def withNewChildInternal(c: Expression): AsciiFold = copy(c)
    override def prettyName: String = "ascii_fold"
  }

  case class SnowballStem(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(Porter2.stem(v.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression): SnowballStem = copy(c)
    override def prettyName: String = "snowball_stem"
  }

  /** Column wrappers resolve through the function registry (Spark 4
    * keeps the Column↔Expression bridge private) — call [[register]]
    * on the session first; the query entries below do. */
  def ascii_fold(c: Column): Column = call_function("ascii_fold", c)
  def snowball_stem(c: Column): Column = call_function("snowball_stem", c)

  /** Register on the session (DataFrame + SQL surface) — delegates to
    * the shared table ([[GraftRegistry]]). */
  def register(spark: SparkSession): Unit = GraftRegistry.register(spark)

  /** The full blank_english analyzer: text → array of normalized,
    * folded, stemmed tokens. */
  def analyzeBlankEnglish(text: Column): Column =
    transform(split(trim(text), "\\s+"),
      t => snowball_stem(ascii_fold(lower(t))))

  // ------------------------------------------------------- queries //

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // oracle-checkable part of the analyzer (lowercase + ascii fold)
    "t_normalize" -> ((s, dir) => {
      register(s)
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        ascii_fold(lower(col("text"))).as("norm"))
    }),
    // full analyzer incl. stemming — no DuckDB oracle in this env
    // (stem() needs the fts extension); pinned by StemmerSpec goldens.
    // Rows-only gate: the token array is rendered as CSV because the
    // driver's pandas harness can't hash ndarray cells
    "t_analyze" -> ((s, dir) => {
      register(s)
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        array_join(analyzeBlankEnglish(col("text")), ",").as("tokens"))
    }))

  val oracle: Map[String, String] = Map(
    "t_normalize" ->
      "SELECT doc_id, strip_accents(lower(text)) AS norm FROM documents")
}
