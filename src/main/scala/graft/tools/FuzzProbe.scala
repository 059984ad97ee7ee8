package graft.tools
import org.apache.spark.sql.SparkSession
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("t_fuzzy_join")(spark, dir).count()
      println(s"run $i: ${(System.nanoTime()-t0)/1e9}s rows=$n")
    }
    graft.SparkEntry.queries("t_fuzzy_join")(spark, dir).explain("formatted")
  }
}
