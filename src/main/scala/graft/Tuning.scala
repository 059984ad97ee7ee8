package graft

import org.apache.spark.sql.SparkSession

/** Shared scale-adaptive tuning knobs (guide §2: partitioning must
  * derive from the session/cluster, never a constant tuned for one
  * machine). */
object Tuning {

  /** Stage width for COMPUTE-DENSE stages — pair expansion, deletion-
    * variant generation, banded-DP verify. AQE's partition coalescing
    * sizes post-shuffle partitions by BYTES
    * (`advisoryPartitionSizeInBytes` / `minPartitionSize`), which is
    * right for scan/shuffle-bound stages and wrong for stages whose
    * cost per input byte is orders of magnitude above a scan's: a
    * few-MB exchange collapses to 1–2 tasks and the DP/explode runs
    * single-threaded on a 32-core machine (measured: t_fuzzy_join's
    * whole candidate+verify pipeline on ≤4 tasks). An explicit
    * `repartition(computeWidth, key)` pins such stages to the
    * session's configured parallelism — `defaultParallelism` tracks
    * the cluster's cores and `spark.sql.shuffle.partitions` tracks the
    * operator width the user sized for the data, so the max of the
    * two is correct at local[8] and on a 1000-core cluster without
    * editing code. */
  def computeWidth(spark: SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism,
      spark.conf.getOption("spark.sql.shuffle.partitions")
        .map(_.toInt).getOrElse(200))

  // (r15) `spreadNarrow` deleted: its one dedup call site measured
  // slower and was reverted in r14, leaving it dead — and its
  // `df.rdd.getNumPartitions` probe forced plan→RDD conversion at the
  // call site, a hidden cost any future caller would pay. Re-derive
  // from `repartition(computeWidth(spark), key)` if a measured
  // compute-dense stage needs it (the Fuzzy.scala pattern).
}
