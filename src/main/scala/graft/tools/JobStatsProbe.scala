package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/shuffle accounting — the "where does the fixed
  * overhead go" probe (guide §1: measure first). For each named
  * registry query it runs the builder+count twice (cold, warm) and
  * prints, for the WARM run: wall seconds, Spark job count, stage
  * count, task count, shuffle bytes written, input bytes.
  *
  * A query whose warm wall time is dominated by job count × ~50-150 ms
  * local-mode scheduling (tiny shuffle/input bytes) is overhead-bound:
  * the fix is fewer actions/materializations, not faster kernels.
  *
  * Usage: runMain graft.tools.JobStatsProbe <sfDir> <name> [name...]
  */
object JobStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleW = new AtomicLong(0L)
    val input = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffleW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
    })
    // session warm-up so the first probed query doesn't carry JIT cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // cold pass (JIT + page cache)
      Thread.sleep(200)      // let straggler listener events drain
      jobs.set(0); stages.set(0); tasks.set(0); shuffleW.set(0); input.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"stats $name: ${sec}%.2fs rows=$n jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} " +
        f"shuffleMB=${shuffleW.get / 1e6}%.1f inputMB=${input.get / 1e6}%.1f")
    }
    spark.stop()
  }
}
