package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def invalidate(): Unit = cache.clear()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // the cached events plan needs this conf at EXECUTION time too —
      // re-establish on every load, not only on cache miss
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val key = (spark, dir, name)
    // get-then-putIfAbsent: listing/footer I/O must not run under the
    // map's bin lock (computeIfAbsent would stall same-bin loads)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      if (cache.size > 256) cache.clear()
      val fresh = loadFresh(spark, dir, name)
      val prev = cache.putIfAbsent(key, fresh)
      if (prev != null) prev else fresh
    }
  }

  private def loadFresh(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as raw nanos (legacy long mode) and
      // convert with exact integer division (`DIV`, not `/` — the
      // double path loses sub-µs precision at 2^60 magnitudes).
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
