package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** No registry query may leave storage-memory blocks behind: in a
  * long-lived service session (or the 98-query bench sweep) a leaked
  * persist() accumulates for the life of the JVM. Operators either
  * unpersist in try/finally before returning (eager outputs) or use
  * write-and-readback snapshots instead of persist() (lazy outputs) —
  * this spec is the gate that keeps it that way.
  */
class PersistHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.HashExpressions.register(s)
    s
  }

  val sf = "/root/testdata/sf0.001"

  test("every registry query leaves zero persistent RDDs behind") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf).count()
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} persisted RDD(s): " +
          leaked.values.map(_.name).mkString(", "))
    }
  }
}
