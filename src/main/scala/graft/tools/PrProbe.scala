package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.sources.Tables

/** Scratch timing probe for pageRank phases (not part of the bench). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PROBE $what ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val orders = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val edges = Graph.customerSupplierEdgesNum(orders, li)
    val ec = t("edges.count")(edges.count())
    println(s"PROBE n_edges $ec")
    for (i <- 1 to 2)
      t(s"pageRank run$i")(Graph.pageRank(edges, 5).count())
    spark.stop()
  }
}
