package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift monitor: the production form of
  * [[graft.operators.Profile.psiDrift]]. A reference corpus is
  * profiled ONCE into a frozen model (quantile cuts + per-bucket
  * reference histogram); each arriving micro-batch then buckets
  * against the frozen cuts and the monitor publishes the PSI of the
  * ACCUMULATED candidate stream vs the reference — "has everything
  * ingested so far drifted away from what we trained the filters
  * on?", re-answered after every batch. This is the monitor a crawl
  * intake runs continuously, where the batch operator is the one-off
  * audit before a data drop joins a training mix.
  *
  * Scale shape: the reference is scanned exactly once at fit time
  * (driver model = nBuckets−1 cut doubles + nBuckets counts — bounded
  * by construction). Per batch: bucket assignment is a scan-local
  * literal-comparison sum, the batch histogram is one ≤nBuckets-row
  * aggregate, and the accumulated histogram is a sum over per-batch
  * partials — state is O(batches · nBuckets) rows of integers, never
  * document content (the same state discipline as
  * [[CorpusStream.curationStage]]'s docfreq partials).
  *
  * Replay safety (foreachBatch is at-least-once): a replayed batch
  * overwrites ITS OWN partial directory (`statePath/batch=<id>`) and
  * its own report directory (`outDir/batch=<id>`), so every effect
  * converges — identical protocol to the curation stream.
  */
object DriftStream {

  /** Frozen reference model: `cuts` are the (nBuckets−1) quantile
    * boundaries, `refCounts(b)` the reference count of bucket b. */
  final case class RefModel(cuts: Seq[Double], refCounts: Seq[Long]) {
    def nBuckets: Int = refCounts.length
  }

  private def bucketOf(v: Column, cuts: Seq[Double]): Column =
    // coalesce: NULL values fold to a NULL bucket, which NPE'd the
    // reference fit's primitive getInt and diverged from the batch
    // operator — bucket 0 matches Profile.psiDrift's (fixed) NULL
    // classification (code-review r10)
    coalesce(cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + (v.cast("double") > lit(c)).cast("int") }, lit(0))

  /** Profile the reference ONCE — same decile arithmetic as the
    * batch operator ([[graft.operators.Profile.psiDrift]] computes
    * identical cuts over its reference slice, which is what makes the
    * stream-equals-batch spec pin possible). The collect is the
    * bounded driver model: nBuckets rows. */
  def fitReference(ref: DataFrame, value: Column,
                   nBuckets: Int = 10): RefModel = {
    val v = ref.select(value.cast("double").as("v"))
    val qs = (1 until nBuckets).map(i =>
      s"${i.toDouble / nBuckets}D").mkString(", ")
    val cuts = v.agg(expr(s"percentile(v, array($qs))"))
      .head().getSeq[Double](0)
    val counts = v.groupBy(bucketOf(col("v"), cuts).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    RefModel(cuts, (0 until nBuckets).map(b => counts.getOrElse(b, 0L)))
  }

  /** One monitoring micro-batch: fold the batch's histogram into the
    * accumulated state, then publish per-bucket PSI of accumulated
    * candidates vs the frozen reference to `outDir/batch=<id>`.
    * Output schema ≡ the batch operator's (bucket, n_ref, n_cand,
    * psi_term) — and on the same data the VALUES are identical too
    * (spec-pinned), because cuts, ε-smoothing and rounding restate
    * the batch arithmetic verbatim. Buckets empty on BOTH sides are
    * omitted, matching the batch operator's groupBy semantics. */
  def driftStage(batch: DataFrame, batchId: Long, model: RefModel,
                 value: Column, statePath: String, outDir: String): Unit = {
    val s = batch.sparkSession
    batch.select(bucketOf(value, model.cuts).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_part"))
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    val cum = s.read
      .schema("bucket INT, n_part BIGINT") // pinned: empty-dir safe
      .parquet(statePath)
      .groupBy(col("bucket")).agg(sum(col("n_part")).as("n_cand"))
    val ref = s.createDataFrame(
      model.refCounts.zipWithIndex.map { case (n, b) => (b, n) })
      .toDF("bucket", "n_ref")
    val joined = ref.join(cum, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
      .filter(col("n_ref") > 0 || col("n_cand") > 0)
    val tot = joined.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cand")).as("t_cand"))
    val pr = col("n_ref").cast("double") / col("t_ref")
    val pc = col("n_cand").cast("double") / col("t_cand")
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cand"),
        (round((pc - pr) * log((pc + 1e-6) / (pr + 1e-6)) * 1e4) / 1e4)
          .as("psi_term"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  /** Start the drift monitor over a (value-bearing) document stream:
    * every micro-batch runs [[driftStage]] against the frozen
    * `model`. */
  def driftStream(docsStream: DataFrame, model: RefModel, value: Column,
                  statePath: String, outDir: String,
                  checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        driftStage(batch, batchId, model, value, statePath, outDir)
      }
      .start()
}
