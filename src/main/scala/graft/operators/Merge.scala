package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Partition-pruned MERGE (upsert) on plain parquet — the managed-
  * table primitive (Delta/Iceberg `MERGE INTO`) re-expressed as an
  * explicit bucketed layout + selective-rewrite protocol. The
  * reference's closest shape is its Media-view CTAS refresh; this is
  * the incremental form a 100 TB pipeline actually needs.
  *
  * Layout: the target is written `partitionBy("_mb")` where
  * `_mb = pmod(xxhash64(key), nBuckets)` — a deterministic hash
  * bucket. A MERGE then:
  *
  *   1. computes the source's touched bucket set (distinct `_mb` of
  *      the delta — a few values, collected driver-side);
  *   2. reads ONLY those target buckets (partition pruning on `_mb`:
  *      the scan never touches untouched data);
  *   3. anti-joins the old rows against the delta keys, unions the
  *      delta in (upsert semantics: delta wins on key match);
  *   4. overwrites ONLY the touched bucket directories
  *      (`partitionOverwriteMode=dynamic` — untouched buckets are
  *      not rewritten, not even re-listed).
  *
  * Cost is O(|delta| + |touched buckets|), not O(|target|): with
  * nBuckets sized so a bucket fits a task (e.g. 4096 at 100 TB →
  * ~25 GB/bucket, or more buckets for finer grain), a 1%-of-keys
  * delta rewrites ~1% of the table. The same layout co-locates
  * repeated merges: the delta is bucketed by the SAME hash, so the
  * anti-join shuffles only the delta side.
  */
object Merge {

  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets))

  /** Write `df` as a bucketed merge target at `path`. */
  def writeTarget(df: DataFrame, path: String, key: String,
                  nBuckets: Int = 16): Unit =
    df.withColumn("_mb", bucketOf(col(key), nBuckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_mb").parquet(path)

  /** Upsert `delta` into the bucketed target at `path`. Key matches
    * take the delta row; new keys append. Only buckets containing
    * delta keys are read or rewritten. */
  def into(spark: SparkSession, path: String, delta: DataFrame,
           key: String, nBuckets: Int = 16): Unit = {
    val d = delta.withColumn("_mb", bucketOf(col(key), nBuckets))
    // touched buckets: at most nBuckets longs — a driver-side set,
    // not a data collect
    val touched = d.select(col("_mb")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val target = spark.read
      // schema from the parquet footer, partition column retained
      .option("basePath", path).parquet(path)
      .filter(col("_mb").isin(touched.toIndexedSeq: _*)) // partition-pruned scan
    val deltaKeys = d.select(col(key).as("_d_key")).distinct()
    val merged = target
      .join(deltaKeys, target(key) === col("_d_key"), "left_anti")
      .drop("_d_key")
      .unionByName(d.withColumn("_mb", col("_mb").cast("long")))
    // staged write + per-bucket directory swap: the merged buckets
    // land next to the live table, then only the touched `_mb=`
    // directories move into place. Never an in-place overwrite of a
    // path being read; a crash mid-swap loses at most the swap (the
    // staging copy is still complete). On HDFS/object stores the
    // renames go through the FileSystem API; locally java.io suffices.
    val staging = path + "_m_staging"
    merged.write.mode(SaveMode.Overwrite).partitionBy("_mb").parquet(staging)
    touched.foreach { b =>
      val src = new java.io.File(staging, s"_mb=$b")
      val dst = new java.io.File(path, s"_mb=$b")
      deleteRecursively(dst)
      if (!src.renameTo(dst))
        throw new java.io.IOException(s"merge swap failed for bucket $b")
    }
    deleteRecursively(new java.io.File(staging))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Read a merge target (drops the layout column). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("_mb")

  // ------------------------------------------------------- queries //

  /** Oracle-checked end-to-end merge: customers upserted with a delta
    * (500 updated balances + 100 new synthetic customers), read back.
    * The DuckDB oracle states the same upsert relationally — no merge
    * machinery — so the bucketed rewrite protocol is hash-verified. */
  def mergeDemo(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_merge").toString
    writeTarget(c, path, "c_custkey")
    val delta = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"),
        concat(lit("upd#"), col("c_name")).as("c_name"),
        (col("c_acctbal") + 1000.0).as("c_acctbal"))
      .unionByName(c.select(
        (col("c_custkey") + 1000000).as("c_custkey"),
        concat(lit("new#"), col("c_name")).as("c_name"),
        lit(0.0).as("c_acctbal"))
        .filter(col("c_custkey") % 5 === 0))
    into(s, path, delta, "c_custkey")
    read(s, path).select(col("c_custkey"), col("c_name"),
      (org.apache.spark.sql.functions.round(col("c_acctbal") * 1e2) / 1e2)
        .as("acctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_merge_upsert" -> (mergeDemo _))

  val oracle: Map[String, String] = Map(
    // the upsert stated relationally: updated-or-kept customers plus
    // appended synthetic ones — must hash-match the bucketed rewrite
    "m_merge_upsert" ->
      """WITH delta AS (
           SELECT c_custkey, 'upd#' || c_name AS c_name, c_acctbal + 1000.0 AS c_acctbal
           FROM customer WHERE c_custkey % 3 = 0
           UNION ALL
           SELECT c_custkey + 1000000, 'new#' || c_name, 0.0
           FROM customer WHERE (c_custkey + 1000000) % 5 = 0)
         SELECT c_custkey, c_name, round((c_acctbal)*1e2)/1e2 AS acctbal FROM (
           SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
           UNION ALL
           SELECT * FROM delta)""")
}
