package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming maintenance of a persisted IVF ANN index: each
  * micro-batch of (vec_id, embedding) arrivals appends into the
  * cell-partitioned layout under the FROZEN centroid model
  * ([[Similarity.appendIvfIndex]] — no retraining, O(batch) work per
  * trigger), gated by [[MergeStream]]'s high-water-mark protocol so
  * an at-least-once replayed batch is SKIPPED rather than appended
  * twice — appendIvfIndex is not idempotent: re-appending would
  * duplicate vectors and advance the disk-truth fingerprint past the
  * corpus. The index must exist ([[Similarity.ensureIvfIndex]])
  * before the stream starts: the stream grows it, it never trains.
  *
  * Read visibility: cell files are immutable once written and
  * appends only add files, so a concurrent [[Similarity
  * .searchIvfIndex]] sees a monotone prefix of the growth — possibly
  * a partial batch if it lists files mid-append, which is acceptable
  * for ANN search (no in-place mutation, no torn rows); exact
  * snapshot isolation would need the Merge manifest protocol. Single
  * writer per index path (the MergeStream contract). */
object AnnStream {

  /** One micro-batch of the ingest — exposed so the spec drives
    * replay scenarios deterministically ([[CorpusStream
    * .curationStage]] convention). */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
                  id: String): Unit =
    if (batchId > MergeStream.lastApplied(indexPath, id)) {
      Similarity.appendIvfIndex(batch, indexPath)
      MergeStream.recordApplied(indexPath, id, batchId)
    }

  /** Start the ingest stream over `vecStream` (vec_id, embedding). */
  def ingestStream(vecStream: DataFrame, indexPath: String,
                   checkpoint: String): StreamingQuery = {
    val id = MergeStream.streamId(checkpoint)
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexPath, id)
      }
      .start()
  }
}
