package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-size probe for the MinHash+LSH discovery path at a given
  * scale factor and banding: banded-row count, bucket-size tail,
  * capped-bucket count, and candidate-pair volume — the numbers that
  * decide whether a banding regime is discovery (linear) or a
  * disguised cross product. Diagnostic only. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bands = if (args.length > 1) args(1).toInt else 32
    val rows = if (args.length > 2) args(2).toInt else 2
    val maxBucket = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val sigd = graft.operators.Dedup.signatures(docs)
    val banded = graft.operators.Dedup.bandKeys(sigd, bands, rows)
    val sizes = banded.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n")).persist()
    try {
      val stats = sizes.agg(
        count(lit(1)).as("buckets"),
        sum(col("n")).as("rows"),
        max(col("n")).as("max_n"),
        expr("approx_percentile(n, 0.99)").as("p99"),
        sum(when(col("n") > maxBucket, 1)).as("over_cap"),
        sum(when(col("n").between(2, maxBucket), col("n") * (col("n") - 1) / 2))
          .as("cand_pairs")).collect()(0)
      println(s"[lshprobe] sf=$sfDir bands=$bands rows=$rows " +
        s"buckets=${stats.get(0)} bandedRows=${stats.get(1)} " +
        s"maxBucket=${stats.get(2)} p99=${stats.get(3)} " +
        s"overCap=${stats.get(4)} candPairs=${stats.get(5)}")
    } finally { sizes.unpersist(); () }
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshprobe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"[lshprobe] --- rep $rep ---")
      // hand-staged replica of minhashVerifiedPairs with per-stage
      // timing (and an explicit snapshot dir per rep)
      val dir = s"/tmp/lshprobe_pairs_$rep"
      time("stage: discovery pairs -> snapshot")(
        graft.operators.Dedup.minhashPairs(docs, bands, rows, 0.0)
          .select(col("doc_a"), col("doc_b"))
          .write.mode("overwrite").parquet(dir))
      val pairs = spark.read.parquet(dir)
      val candDocs = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val cand = docs.join(candDocs, Seq("doc_id"), "left_semi")
      val n2 = time("stage: exact rerank over candidates")(
        graft.operators.Dedup.ngramJaccardPairs(cand, 0.5).count())
      val n3 = time("stage: rerank JOIN pairs")(
        pairs.join(
          graft.operators.Dedup.ngramJaccardPairs(cand, 0.5),
          Seq("doc_a", "doc_b")).count())
      val n4 = time("public minhashVerifiedPairs")(
        graft.operators.Dedup.minhashVerifiedPairs(docs, 0.5, bands, rows, 0.0).count())
      println(s"[lshprobe] rows: rerank=$n2 joined=$n3 public=$n4")
    }
    spark.stop()
  }
}
