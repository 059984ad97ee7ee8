package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Fuzzy
import graft.sources.Tables

/** TRUE decade slope for the fuzzy join (PERF_r13 residue): the
  * ScaleUp replicas repeat `c_name` verbatim (only keys shift), so
  * `editSelfJoin`'s distinct-name domain — and therefore TimeProbe's
  * t_fuzzy_join column — never grows with scale. This probe grows the
  * domain itself: replica k appends a 6-char tag built from two
  * letters each repeated 3×, so any two replicas' tags differ in ≥3
  * aligned positions — strictly more than 2·τ for τ=1, putting every
  * cross-replica name pair beyond reach of the join (same device as
  * ScaleUp's shingle-disjoint document suffixes, restated for edit
  * distance: equal lengths + shared prefix make edit = Hamming on the
  * tag, and a ≤1-edit script can change at most 2 aligned positions
  * of an equal-length pair, one per side).
  *
  * That makes the truth set EXACTLY linear: each replica contributes
  * the base corpus's within-replica pairs and nothing else, so
  * `pairs(F) = F · pairs(1)` is a built-in oracle — no DuckDB needed
  * at any scale (blocking losslessness itself is the gated
  * t_fuzzy_join hash proof at 1×; this probe certifies the SLOPE).
  * A superlinear candidate blowup (the failure the deletion-
  * neighborhood design exists to prevent) would surface as a
  * superlinear time column against a linear rows column.
  *
  * Usage: runMain graft.tools.FuzzScaleProbe <sfDir> [factor ...]
  * (defaults: 1 10 100). Prints one line per factor:
  * `fuzz_scale factor=F names=N pairs=P sec=S`.
  */
object FuzzScaleProbe {

  /** Base corpus names + replicas 1..F-1 tagged with edit-disjoint
    * 6-char suffixes (k → letters of k/26, k%26, each ×3). */
  def grownNames(spark: SparkSession, dir: String, factor: Int): DataFrame = {
    val base = Tables.load(spark, dir, "customer").select(col("c_name"))
    val tagged = (1 until factor).map { k =>
      val tag = s"${('a' + k / 26).toChar.toString * 3}" +
        s"${('a' + k % 26).toChar.toString * 3}"
      base.select(concat(col("c_name"), lit(tag)).as("c_name"))
    }
    tagged.foldLeft(base)(_.unionAll(_))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factors =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var basePairs = -1L
    factors.foreach { f =>
      val names = grownNames(spark, dir, f).cache()
      val n = names.count() // materialize the union outside the timing
      val t0 = System.nanoTime()
      val pairs = Fuzzy.editSelfJoin(names, col("c_name"), 1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (f == 1) basePairs = pairs
      val oracleNote =
        if (basePairs < 0) "linear-oracle=N/A(no factor-1 baseline)"
        else if (pairs == f * basePairs) "linear-oracle=OK"
        else s"linear-oracle=FAIL(expected ${f * basePairs})"
      println(f"fuzz_scale factor=$f names=$n pairs=$pairs sec=$sec%.2f $oracleNote")
      names.unpersist()
    }
  }
}
