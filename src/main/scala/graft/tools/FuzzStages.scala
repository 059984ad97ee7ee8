package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Fuzzy
import graft.sources.Tables

/** Stage-by-stage cost breakdown of the fuzzy self-join — where do
  * t_fuzzy_join's seconds actually go? Times, separately: (1) the
  * distinct + deletion-variant explode + materialize, (2) the
  * key-bucket pair expansion + distinct (candidate generation), and
  * (3) the banded-levenshtein verify over the candidates. Each stage
  * is forced with count() on its own snapshot so downstream stages
  * don't re-run upstream work.
  *
  * Usage: runMain graft.tools.FuzzStages <sfDir> [tau=1]
  */
object FuzzStages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tau = if (args.length > 1) args(1).toInt else 1
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HashExpressions.register(spark)
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val names = Tables.load(spark, dir, "customer").select(col("c_name"))
    val keyed = timed("stage1 keys (distinct+explode+persist)") {
      val k = names.select(col("c_name").as("nm")).distinct()
        .select(col("nm"),
          explode(Fuzzy.deletionVariants(col("nm"), tau)).as("dk"))
        .persist()
      println(s"  key rows: ${k.count()}")
      k
    }
    val cand = timed("stage2 candidates (bucket join + distinct + persist)") {
      val c = keyed.as("a").join(keyed.as("b"),
          col("a.dk") === col("b.dk") && col("a.nm") < col("b.nm"))
        .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"))
        .distinct()
        .persist()
      println(s"  candidate pairs: ${c.count()}")
      c
    }
    timed("stage3 verify (banded levenshtein)") {
      val n = cand
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), tau))
        .filter(col("dist") >= 0 && col("dist") <= tau)
        .count()
      println(s"  true pairs: $n")
    }
    spark.stop()
  }
}
