package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and
  * total wall seconds. Each query is forced with .count() (full plan
  * execution, no result materialization on the driver). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up outside the timed region (otherwise the
    // alphabetically-first query pays all JIT + first-scan cost)
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("b1_scan")
      .foreach(fn => fn(spark, sfDir).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // a failed query reports -1, not a fast-looking elapsed time
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // ETL throughput vs BASELINE.md's headline 568 entities/s (the
    // reference's only published number): 50k-entity synthetic dump
    // through the full load pipeline
    val etlEps = try {
      // drop 67 queries' worth of session residue (cached relations,
      // broadcast blocks) so the ETL measures the pipeline, not GC
      spark.catalog.clearCache()
      System.gc()
      graft.tools.EtlBench.timedLoad(spark, 50000,
        "/tmp/graft_bench_dump.json", "/tmp/graft_bench_etl")
    } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","etl_entities_per_sec":$etlEps,"etl_baseline_eps":568}""")
    spark.stop()
  }
}
