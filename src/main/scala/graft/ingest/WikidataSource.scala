package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** File sources for Wikidata dumps (SURVEY §2.A A1-A7).
  *
  * The dump is newline-delimited JSON wrapped in a top-level array:
  * first line `[`, last line `]`, entity objects on interior lines with
  * trailing commas (reference: `src/utils.rs:125-129`,
  * `src/utils/init_reader.rs`). We read it as TEXT — splittable, and
  * for `.bz2` Hadoop streams + splits blocks, parallelizing what the
  * reference decompresses single-threaded — clean the line artifacts,
  * then `from_json` with the explicit raw schema (no inference pass
  * over a >1 TB dump).
  *
  * Both line forms parse in one pass: bare dump entities and the
  * `{"entities":{...}}` fixture envelope (FIXTURES.md §1.1).
  */
object WikidataSource {

  /** Supported input formats (A3 format dispatch). Spark decodes the
    * compression transparently from the file extension; the parameter
    * exists for reference parity and fails fast on unknown formats. */
  val formats: Set[String] = Set("json", "bz2")

  /** Read dump lines → one row per *parsed candidate* line with a
    * single `j` struct column (raw schema). Malformed lines yield a
    * null-field struct and are dropped downstream (A7 skip-bad-records
    * — the reference skips silently, we keep the behavior). */
  def readRaw(spark: SparkSession, path: String, format: String = "json"): DataFrame = {
    require(formats.contains(format),
      s"unknown WIKIDATA_FILE_FORMAT '$format' (expected one of $formats)")
    fromLines(spark.read.text(path))
  }

  /** Line cleanup + parse over ANY lines DataFrame — batch or
    * streaming (`spark.readStream.text`): every step is per-row, so
    * the same pipeline runs unchanged under Structured Streaming. */
  def fromLines(lines: DataFrame): DataFrame = {
    // A5 line cleanup: strip whitespace + trailing comma; `[`/`]` lines
    // then parse to all-null structs and fall out with the bad records.
    val cleaned = lines
      .select(regexp_replace(trim(col("value")), ",$", "").as("line"))
      .filter(col("line") =!= "[" && col("line") =!= "]" && col("line") =!= "")
    cleaned.select(from_json(col("line"), Schemas.rawLine).as("j"))
  }

  /** Unwrap to one row per entity with the bare `rawEntity` schema,
    * accepting both line forms. A wrapped line may carry several
    * entities — all are kept (superset of the reference, which assumes
    * one). */
  def entities(raw: DataFrame): DataFrame = {
    val bareStruct = struct(
      col("j.type").as("type"), col("j.id").as("id"),
      col("j.datatype").as("datatype"), col("j.labels").as("labels"),
      col("j.lemmas").as("lemmas"),
      col("j.descriptions").as("descriptions"), col("j.claims").as("claims"))
    raw
      .select(explode(
        when(col("j.entities").isNotNull, map_values(col("j.entities")))
          .otherwise(array(bareStruct))).as("e"))
      // A7: drop lines that didn't parse into an entity shape, and ids
      // outside Q/P/L (forms, senses, E-entities) — skip, never panic
      // (reference todo!() hazard, SURVEY §7.4).
      .filter(col("e.id").isNotNull && col("e.id").rlike("^[QPL][0-9]+$"))
      .select(col("e.*"))
  }

  /** One-call source: path → entity rows. */
  def read(spark: SparkSession, path: String, format: String = "json"): DataFrame =
    entities(readRaw(spark, path, format))
}
