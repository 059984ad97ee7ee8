package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.operators.Bpe
import graft.sources.Tables

/** Scale probe for the batched BPE trainer: train large vocabularies
  * on a real dictionary and report wall-clock + Spark-job counts at
  * increasing merge targets — flat seconds-per-merge and
  * jobs-per-merge ≪ 1 are the evidence that batching + checkpointing
  * killed the one-job-per-merge / unbounded-lineage shape.
  *
  * Usage: runMain graft.tools.BpeProbe <sfDir> [nMerges...=250,500,1000]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val targets = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                  else Seq(250, 500, 1000)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    // two dictionaries: the documents corpus (tiny vocab — trains to
    // EXHAUSTION, exercising the early-stop path) and the customer
    // names re-read as a corpus (15k distinct words at sf0.1 — deep
    // enough for 1,000+ merges, the scale the batching exists for)
    val docs = Tables.load(spark, sfDir, "documents")
    val names = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("doc_id"), col("c_name").as("text"))
    for ((label, d) <- Seq("documents" -> docs, "customer_names" -> names)) {
      println(s"PROBE $label dict_words " +
        Bpe.wordCounts(d, col("text")).count())
      for (n <- targets) {
        jobs.set(0)
        val t0 = System.nanoTime()
        val m = Bpe.trainBatched(d, col("text"), n,
          batchK = 16, checkpointEvery = 50).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val got = math.max(m.length, 1)
        println(f"PROBE $label merges=$n got=${m.length} ${sec}%.1f s " +
          f"(${sec / got * 1000}%.0f ms/merge, ${jobs.get()} jobs = " +
          f"${jobs.get().toDouble / got}%.2f jobs/merge)")
      }
      for (n <- targets) {
        jobs.set(0)
        val t0 = System.nanoTime()
        val m = Bpe.trainLocal(d, col("text"), n).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $label LOCAL merges=$n got=${m.length} ${sec}%.1f s " +
          f"(${jobs.get()} jobs total)")
      }
    }
    spark.stop()
  }
}
