package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Geo}
import graft.sources.Tables

/** Stage-level timing breakdown of q_geo_dbscan — which of the four
  * phases (neighbor stencil join, core counts, CC over core edges,
  * border/noise assembly) owns the gate's wall time.
  *
  * Usage: runMain graft.tools.DbscanProbe <sfDir>
  */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dbscan-probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pts = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("id"),
        Geo.latOf("c", col("c_custkey")).as("lat"),
        Geo.lonOf("c", col("c_custkey")).as("lon"))
    val nbr = Geo.radiusJoin(pts, pts, 800.0)
      .filter(floor(col("left_id") / 1e9).cast("long") ===
        floor(col("right_id") / 1e9).cast("long"))
    t("nbr stencil join (count)") { nbr.count() }
    val core = nbr.groupBy(col("left_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 4)
      .select(col("left_id").as("id"))
    t("core counts (count)") { core.count() }
    val edges = nbr
      .join(core.select(col("id").as("left_id")), "left_id")
      .join(core.select(col("id").as("right_id")), "right_id")
      .filter(col("left_id") =!= col("right_id"))
      .select(col("left_id"), col("right_id"))
    val nEdges = t("core-core edges (count)") { edges.count() }
    val comp = t("connected components (materialized)") {
      val c = Dedup.connectedComponents(edges)
      c.count(); c
    }
    println(s"[dbscan-probe] edges=$nEdges comps=${comp.select("component").distinct().count()}")
    t("full dbscan end-to-end (count)") {
      Geo.dbscan(pts, 800.0, 4).count()
    }
    spark.stop()
  }
}
