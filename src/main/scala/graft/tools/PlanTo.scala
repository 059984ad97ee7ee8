package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps `explain("formatted")` of NAMED registry queries to files —
  * the per-round optimization evidence trail (plans/r{N}/<q>_before.txt
  * / _after.txt), unlike [[PlanDump]]'s fixed headline list.
  *
  * {{{ runMain graft.tools.PlanTo <sfDir> <outDir> <suffix> <q1,q2,...> }}}
  *
  * Caveat shared with PlanDump: queries whose builders run real writes
  * at plan-build time (index builds, versioned merges) execute those
  * writes here; the dumped plan is the final returned stage, which for
  * snapshot-based operators is the interesting post-snapshot shape.
  */
object PlanTo {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanTo <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, names) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), formatted)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
