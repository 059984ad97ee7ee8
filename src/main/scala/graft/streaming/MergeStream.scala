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
  * Replay protocol (foreachBatch is at-least-once):
  *   - a `_applied_hwm.tsv` sidecar records the highest batchId
  *     folded in, published by atomic tmp-then-rename AFTER the merge
  *     commits its manifest; a redelivered batch at-or-below the
  *     high-water mark is skipped, so the version chain normally
  *     grows exactly once per batch;
  *   - a crash INSIDE the window (manifest published, sidecar not)
  *     makes the replay re-merge the same delta: upserts are
  *     content-idempotent (same keys anti-joined, same rows
  *     re-inserted), so the extra version carries an IDENTICAL state
  *     — convergent, never lost or doubled rows.
  */
object MergeStream {

  private def hwmFile(path: String) = new java.io.File(path, "_applied_hwm.tsv")

  /** Highest batchId already folded into the target (-1 when none). */
  def lastApplied(path: String): Long = {
    val f = hwmFile(path)
    if (!f.exists()) -1L
    else java.nio.file.Files.readString(f.toPath).trim.toLong
  }

  private def recordApplied(path: String, batchId: Long): Unit = {
    val f = hwmFile(path)
    val tmp = new java.io.File(path, "_applied_hwm.tsv.tmp")
    java.nio.file.Files.writeString(tmp.toPath, s"$batchId\n")
    if (!tmp.renameTo(f)) {
      f.delete()
      if (!tmp.renameTo(f))
        throw new java.io.IOException(s"hwm publish failed for $batchId")
    }
  }

  /** One micro-batch of the CDC apply — exposed so the spec can
    * drive replay scenarios deterministically. */
  def applyBatch(spark: SparkSession, path: String, key: String,
                 batch: DataFrame, batchId: Long): Unit =
    if (batchId > lastApplied(path)) {
      Merge.mergeVersioned(spark, path, batch, key)
      recordApplied(path, batchId)
    }

  /** Start the upsert stream: `deltaStream` rows are change records
    * (last write per key wins within a batch per Merge semantics);
    * the target at `path` must exist ([[Merge.writeVersioned]]). */
  def upsertStream(deltaStream: DataFrame, path: String, key: String,
                   checkpoint: String): StreamingQuery =
    deltaStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, path, key, batch, batchId)
      }
      .start()
}
