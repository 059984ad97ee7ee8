package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. At
  * cluster scale these would be partitioned/bucketed datasets; the
  * loader is the single seam where that changes (swap the path for a
  * partitioned root + bucketing metadata, nothing downstream moves).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at ANY scale factor: TPC-H's
    * region (5 rows) and nation (25 rows) are constant-size by spec.
    */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  /** Plan-handle cache: repeated loads of the same table re-list
    * files and re-read footers (a fresh InMemoryFileIndex per call) —
    * measurable fixed cost across a 60-query run. DataFrames are
    * immutable plan handles, safe to share within a session. Keys
    * hold the session REFERENCE (exact identity — sessions don't
    * override equals; an identity hash alone can collide). The cached
    * listing pins the directory snapshot: call [[invalidate]] after
    * rewriting a table dir mid-session. Bounded: cleared wholesale
    * past a size cap so long-lived multi-session JVMs can't pin
    * stopped sessions forever. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Keys whose cached plan reads parquet TIMESTAMP(NANOS) via the
    * legacy nanos-as-long mode. That conf is read again at EXECUTION
    * time, so it must be re-established whenever such a plan is handed
    * out — but ONLY then: a conf write per lookup is a global session
    * side effect that other plans don't want. */
  private val nanosKeys = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(SparkSession, String, String)]()

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def invalidate(): Unit = { cache.clear(); nanosKeys.clear() }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, dir, name)
    // get-then-putIfAbsent: listing/footer I/O must not run under the
    // map's bin lock (computeIfAbsent would stall same-bin loads)
    val hit = cache.get(key)
    if (hit != null) {
      if (nanosKeys.contains(key)) spark.conf.set(NanosConf, "true")
      hit
    } else {
      if (cache.size > 256) { cache.clear(); nanosKeys.clear() }
      val fresh = loadFresh(spark, dir, name, key)
      val prev = cache.putIfAbsent(key, fresh)
      if (prev != null) prev else fresh
    }
  }

  /** Timestamp columns per table: the driver regenerates testdata
    * between rounds and the physical type of these has already flipped
    * once (round 6→7: events.ts TIMESTAMP(NANOS) → TIMESTAMP(µs)),
    * taking 13 queries down. Every column here gets the schema-adaptive
    * treatment in [[normalize]]. */
  private val timestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  /** The driver's testdata ships as parquet TIMESTAMP(NANOS) in some
    * generations and plain TIMESTAMP(µs) in others. Adapt to whatever
    * the footer says instead of assuming one:
    *  - NANOS: schema inference itself rejects the type, so retry under
    *    the legacy nanos-as-long mode and convert with exact integer
    *    division (`DIV`, not `/` — the double path loses sub-µs
    *    precision at 2^60 magnitudes), remembering the key so the conf
    *    is re-established at execution time.
    *  - events.ts as µs without the UTC flag arrives as TIMESTAMP_NTZ:
    *    cast to the session-zone TIMESTAMP (session is pinned UTC
    *    everywhere) so downstream temporal queries and the DuckDB
    *    oracle see the same instant semantics either way. (Orders/
    *    lineitem dates stay NTZ — that is their current green shape.)
    *  - already a timestamp: pass through.
    * embeddings.embedding likewise normalizes to array<float> if a
    * generation ships doubles (the similarity kernels are float-typed). */
  private def loadFresh(spark: SparkSession, dir: String, name: String,
                        key: (SparkSession, String, String)): DataFrame =
    normalize(name, rawTable(spark, s"$dir/$name.parquet", Some(key)))

  /** Batch-read a table, retrying under the legacy nanos-as-long mode
    * when the footer carries TIMESTAMP(NANOS) (schema inference itself
    * rejects that type). `key` (batch cache key) is remembered so
    * cache hits re-establish the conf at execution time. */
  private def rawTable(spark: SparkSession, path: String,
                       key: Option[(SparkSession, String, String)]): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Exception
          if e.getMessage != null &&
            e.getMessage.contains("TIMESTAMP(NANOS") =>
        spark.conf.set(NanosConf, "true")
        key.foreach(nanosKeys.add)
        spark.read.parquet(path)
    }

  /** Per-table, per-shape normalization (see [[loadFresh]]'s scaladoc).
    * Only repairs KNOWN castable drift; anything else passes through so
    * a genuinely new schema fails loudly in the query that reads it. */
  private def normalize(name: String, raw: DataFrame): DataFrame = {
    val tsFixed = timestampCols.getOrElse(name, Seq.empty)
      .filter(raw.columns.contains)
      .foldLeft(raw) { (df, c) =>
        df.schema(c).dataType match {
          case LongType =>
            df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
          case TimestampNTZType if name == "events" =>
            df.withColumn(c, col(c).cast(TimestampType))
          case _ => df
        }
      }
    if (name == "embeddings" && raw.columns.contains("embedding"))
      tsFixed.schema("embedding").dataType match {
        case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, _) =>
          tsFixed.withColumn("embedding",
            col("embedding").cast("array<float>"))
        case _ => tsFixed
      }
    else tsFixed
  }

  /** Streaming twin of `load(_, _, "events")`: a file-source stream
    * over the same parquet with the same schema-adaptive ts fix —
    * `readStream` needs an explicit schema, so it is inferred through
    * the batch reader (footer-only I/O) first. In the nanos case the
    * conf set by [[rawTable]] must survive until microbatches execute;
    * callers run the query within the same session ([[graft.streaming.EventsStream.runOnce]]). */
  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw = rawTable(spark, s"$dir/events.parquet", None)
    normalize("events",
      spark.readStream.schema(raw.schema)
        // file-source streaming wants a directory; glob-filter to events
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Register every table as a temp view (for the SQL surface). One
    * broken source must not take down queries over the other nine
    * tables (a round-7 events regression failed unrelated SQL-surface
    * queries through this eager loop) — defer per-table failures to
    * the queries that actually read the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      try load(spark, dir, n).createOrReplaceTempView(n)
      catch {
        case e: Exception =>
          System.err.println(
            s"graft.Tables.registerAll: skipping '$n' ($dir): ${e.getMessage}")
      }
    }
}
