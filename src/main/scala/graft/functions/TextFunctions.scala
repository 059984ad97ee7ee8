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
    // full analyzer incl. stemming — oracled by MECHANISM RESTATEMENT
    // (see analyzeOracleSql): DuckDB has no stemmer offline, but the
    // corpus vocabulary is bounded and Porter2 deterministic, so the
    // oracle restates tokenize+lower+fold in SQL and joins a literal
    // (folded token → stem) map derived at oracle-build time from the
    // SAME committed Porter2. The token array is rendered as CSV
    // because the driver's pandas harness can't hash ndarray cells
    "t_analyze" -> ((s, dir) => {
      register(s)
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        array_join(analyzeBlankEnglish(col("text")), ",").as("tokens"))
    }))

  /** The driver corpus's folded-token vocabulary: union over the
    * sf0.001/sf0.01/sf0.1 `documents` tables of
    * `strip_accents(lower(tok))` for every blank-split token —
    * measured at 31 stable words (the synthetic generator draws from
    * a fixed word list). The scale replicas (tools/ScaleUp) suffix
    * every token of replica k>0 with the fixed-width two-letter code
    * letterSuffix(k), so those variants are enumerated too (replicas
    * 1-99, covering the 100x rehearsal) — a few thousand literal
    * pairs. A token outside the map degrades to a loud
    * `<unmapped:...>` sentinel in the oracle — a visible hash
    * mismatch, never a silent pass (exactly how the r12 suffix-width
    * change surfaced at the 10x gate). */
  private val baseVocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")
  private val corpusVocab: Seq[String] =
    // replica suffixes follow tools/ScaleUp.letterSuffix: fixed-width
    // two-letter base-26 (r12 convention — prefix-free across ALL
    // replicas); k to 99 covers the 100x rehearsal, ~3.2k pairs
    baseVocab ++ (for { k <- 1 to 99; w <- baseVocab } yield {
      val n = k - 1
      w + ('a' + n / 26).toChar + ('a' + n % 26).toChar
    })

  /** DuckDB restatement of the full blank_english analyzer
    * (`Useful queries.md:27-28`): blank tokenize + lowercase + accent
    * fold in portable SQL, and the snowball(english) step as a LITERAL
    * (folded token → stem) join whose stems are computed HERE, at
    * oracle-build time, by the committed [[Porter2]] — the same
    * mechanism-restatement shape that oracled `s_embed_neardup`
    * (literal SRP sign matrix). Token order is preserved via zipped
    * unnest ordinality; the CSV join mirrors the Spark side's
    * array_join exactly. */
  private def analyzeOracleSql: String = {
    val pairs = corpusVocab
      .map(w => s"('${w.replace("'", "''")}','${Porter2.stem(w).replace("'", "''")}')")
      .mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
       |         unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')) + 1)) AS ord
       |  FROM documents
       |), stems(tok, stem) AS (VALUES $pairs)
       |SELECT t.doc_id,
       |       string_agg(coalesce(s.stem,
       |         '<unmapped:' || strip_accents(lower(t.tok)) || '>'),
       |         ',' ORDER BY t.ord) AS tokens
       |FROM toks t
       |LEFT JOIN stems s ON strip_accents(lower(t.tok)) = s.tok
       |GROUP BY t.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "t_normalize" ->
      "SELECT doc_id, strip_accents(lower(text)) AS norm FROM documents",
    "t_analyze" -> analyzeOracleSql)
}
