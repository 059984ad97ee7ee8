package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Merge

/** CDC/upsert stream into a VERSIONED [[Merge]] target — the
  * streaming half of the mini-lakehouse: each micro-batch of change
  * rows publishes one new version via [[Merge.mergeVersioned]], so
  * downstream readers get atomic snapshot isolation (they resolve
  * manifests, never in-flight writes) and [[Merge.readVersioned]]
  * time-travels across stream progress. [[Merge.vacuum]] bounds
  * retention independently.
  *
  * Replay protocol (foreachBatch is at-least-once, and batchIds are
  * only meaningful WITHIN one checkpoint lineage):
  *   - the high-water sidecar is scoped to a stream identity derived
  *     from the checkpoint location (the Delta-style (txnAppId,
  *     version) idempotence key): `_applied_hwm_<digest>.tsv` records
  *     the highest batchId that lineage folded in, published by
  *     atomic tmp-then-rename AFTER the merge commits its manifest.
  *     A redelivered batch at-or-below its own lineage's mark is
  *     skipped; a stream RESTARTED WITH A FRESH CHECKPOINT gets a new
  *     identity, so its restarted batch 0 applies instead of being
  *     silently swallowed by the old lineage's mark;
  *   - a crash INSIDE the window (manifest published, sidecar not)
  *     makes the replay re-merge the same delta: upserts are
  *     content-idempotent (same keys anti-joined, same rows
  *     re-inserted), so the extra version carries an IDENTICAL state
  *     — convergent, never lost or doubled rows.
  * Single writer at a time (stream or batch merge): versioned
  * publication is last-writer-wins on the manifest chain, not a
  * concurrent-writer transaction log.
  */
object MergeStream {

  /** Stream identity: stable across restarts on the same checkpoint,
    * fresh when the checkpoint is fresh. */
  def streamId(checkpoint: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  private def hwmFile(path: String, id: String) =
    s"$path/_applied_hwm_$id.tsv"

  /** Highest batchId the `id` lineage folded in (-1 when none). All
    * sidecar I/O rides the [[graft.sources.Dfs]] seam — the CDC
    * target may live on any Hadoop scheme. */
  def lastApplied(path: String, id: String): Long = {
    val f = hwmFile(path, id)
    if (!graft.sources.Dfs.default.exists(f)) -1L
    else graft.sources.Dfs.default.readString(f).trim.toLong
  }

  private[streaming] def recordApplied(path: String, id: String, batchId: Long): Unit =
    // tmp-write + rename publish inside the seam
    graft.sources.Dfs.default.writeStringAtomic(
      hwmFile(path, id), s"$batchId\n")

  /** One micro-batch of the CDC apply — exposed so the spec can
    * drive replay scenarios deterministically. */
  def applyBatch(spark: SparkSession, path: String, key: String,
                 batch: DataFrame, batchId: Long, id: String): Unit =
    if (batchId > lastApplied(path, id)) {
      Merge.mergeVersioned(spark, path, batch, key)
      recordApplied(path, id, batchId)
    }

  /** Start the upsert stream: `deltaStream` rows are change records
    * (last write per key wins within a batch per Merge semantics);
    * the target at `path` must exist ([[Merge.writeVersioned]]). */
  def upsertStream(deltaStream: DataFrame, path: String, key: String,
                   checkpoint: String): StreamingQuery = {
    val id = streamId(checkpoint)
    deltaStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, path, key, batch, batchId, id)
      }
      .start()
  }
}
