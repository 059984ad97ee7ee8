package graft.tools
import org.apache.spark.sql.SparkSession

/** Repeated-run timing + formatted-plan dump for one registry query —
  * the variance-sensitive sibling of [[TimeProbe]] (N timed passes so
  * JIT/cache warmup is visible, then the physical plan).
  *
  * Usage: runMain graft.tools.FuzzProbe <sfDir> <query> [runs=3]
  * Cores via SPARK_GRAFT_CPUS (default 8, matching the original
  * fuzzy-join investigation this tool was built for).
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
  }
}
