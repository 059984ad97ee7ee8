package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Stage-level timing for the triangle-count pipeline: edge build,
  * orientation, wedge generation, closing join, per-node rollup —
  * the breakdown that located the round-10 wedge-join overhead.
  *
  * Usage: runMain graft.tools.TriProbe <sfDir> [sampleMod]
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"tri $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") % mod === 0)
    val e = t("edges")(Graph.coPurchaseEdges(li).localCheckpoint())
    println(s"  edges=${e.count()}")
    val full = t("triangles-from-snapshotted-edges")(
      Graph.trianglesPerNode(e).count())
    println(s"  tri-nodes=$full")
    val endToEnd = t("end-to-end")(Graph.trianglesPerNode(
      Graph.coPurchaseEdges(li)).count())
    println(s"  tri-nodes=$endToEnd")
    spark.stop()
  }
}
