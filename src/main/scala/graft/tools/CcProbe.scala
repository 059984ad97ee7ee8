package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the connected-components stage breakdown at a
  * given scale factor: edge derivation vs CC propagation, and the
  * CC job count. Diagnostic only. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // run twice: second run is JIT/page-cache warm
    (1 to 2).foreach { rep =>
      println(s"[ccprobe] --- rep $rep ---")
      val pairs = time("minhashVerifiedPairs")(
        graft.operators.Dedup.minhashVerifiedPairs(docs)
          .select(col("doc_a"), col("doc_b")).collect())
      println(s"[ccprobe] edges: ${pairs.length}")
      val edges = spark.createDataFrame(
        spark.sparkContext.parallelize(pairs.toIndexedSeq.map(r =>
          (r.getLong(0), r.getLong(1))), 4)).toDF("doc_a", "doc_b")
      val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      time("connectedComponents")(
        graft.operators.Dedup.connectedComponents(edges).count())
      println(s"[ccprobe] cc jobs: ~${spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0}")
    }
    spark.stop()
  }
}
