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
    // fixed-iteration slope: flat marginal cost per iteration is the
    // evidence that the every-10 localCheckpoint keeps the plan from
    // deepening (without it the 40-iteration run re-walks a 40-join
    // lineage each optimization pass)
    var prev = 0.0
    for (n <- Seq(5, 10, 20, 40)) {
      val s0 = System.nanoTime()
      Graph.pageRank(edges, n).count()
      val sec = (System.nanoTime() - s0) / 1e9
      val slope = if (prev > 0) f" (+${(sec - prev)}%.2f s for the added iters)" else ""
      println(f"PROBE pageRank iters=$n ${sec}%.2f s$slope")
      prev = sec
    }
    t("pageRankConverged tol=1e-7 maxIters=100") {
      val r = Graph.pageRankConverged(edges, 100, 1e-7)
      println(s"PROBE converged rows=${r.count()}")
    }
    spark.stop()
  }
}
