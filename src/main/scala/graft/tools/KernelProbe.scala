package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the custom Catalyst kernels: times pure projection
  * scans dominated by one expression each, so codegen-path changes
  * (CodegenFallback → doGenCode) measure directly, without the joins
  * and aggregations that dominate the registry queries.
  *
  * Usage: runMain graft.tools.KernelProbe <sfDir>
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HashExpressions.register(spark)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("embedding"))
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm: file listing + first-scan costs out of the way
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"kernel $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    time("simhash64")(docs
      .select(call_function("simhash64", col("toks")).as("h"))
      .filter(col("h") =!= 0L))
    time("minhash_signature")(docs
      .select(element_at(
        call_function("minhash_signature", col("toks")), 1).as("m"))
      .filter(col("m") =!= 0L))
    time("cosine_similarity")(emb
      .select(call_function("cosine_similarity",
        col("embedding"), col("embedding")).as("c"))
      .filter(col("c") > 0.5))
    spark.stop()
  }
}
