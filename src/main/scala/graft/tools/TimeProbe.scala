package graft.tools

import org.apache.spark.sql.SparkSession

/** Time named registry queries against any scale-factor dir — the
  * scale-rehearsal timing harness (the 10×/100× replica tables in
  * PERF_r08.md come from runs of this).
  *
  * Usage: runMain graft.tools.TimeProbe <sfDir> <name> [name...]
  * Prints `probe <name>: <sec>s rows=<n>` per query (action = count,
  * so result materialization is measured without driver transfer).
  */
object TimeProbe {
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
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"probe $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
  }
}
