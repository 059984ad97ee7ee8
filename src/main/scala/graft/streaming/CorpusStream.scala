package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Online corpus deduplication: documents stream in, each micro-batch
  * is near-dup-filtered against EVERYTHING ingested before it, and the
  * survivors both land in the output corpus and fold into the
  * persisted LSH index ([[Dedup.initLshIndex]] layout) so the next
  * batch checks against them too.
  *
  * This is the streaming form of "dedup a daily shard against the
  * corpus": state is the bucketed band index (~16 B × bands per doc),
  * NOT the corpus text, so per-batch cost is O(batch + candidate
  * pairs) and the whole pipeline never recomputes history.
  *
  * Restart/replay safety (foreachBatch is at-least-once, so every
  * effect must be idempotent):
  *   - the index lives at an explicit `indexDir` (external tables —
  *     [[Dedup.ensureIndexRegistered]] re-creates the catalog entries
  *     after a process restart, so the accumulated index is never
  *     reinitialized);
  *   - the keep-set is DETERMINISTIC across replays: probing excludes
  *     same-id matches, so a batch whose bands already landed still
  *     computes the same survivors;
  *   - the corpus write overwrites a per-batchId directory (same
  *     batch ⇒ same directory ⇒ same rows), and the index append
  *     anti-joins ids already present — replaying any prefix of
  *     (write corpus, append index, commit checkpoint) converges.
  * Within a batch, near-dup clusters keep their smallest doc_id;
  * across batches, earlier-ingested docs win.
  */
object CorpusStream {

  /** Start the online-dedup stream over `docsStream` (doc_id, text).
    * Survivors append to `outDir`; the index lives at `indexDir`
    * under the `table` catalog names. */
  def onlineDedup(docsStream: DataFrame, table: String, indexDir: String,
                  outDir: String, checkpoint: String,
                  minEst: Double = 0.5): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // within-batch first: minhashPairs emits doc_a < doc_b, so
        // dropping every doc_b keeps exactly the cluster minima
        val intra = Dedup.minhashPairs(batch, minEst = minEst)
          .select(col("doc_b").as("doc_id")).distinct()
        val batchKept = batch.join(intra, Seq("doc_id"), "left_anti")
          .persist()
        try {
          val keep =
            if (!Dedup.ensureIndexRegistered(s, table, indexDir)) batchKept
            else {
              // same-id matches are excluded inside dedupAgainstIndex,
              // so a replayed batch (own bands already indexed) still
              // derives the same keep-set
              val dupOfPrior = Dedup
                .dedupAgainstIndex(s, batchKept, table, minEst)
                .select(col("new_id").as("doc_id")).distinct()
              batchKept.join(dupOfPrior, Seq("doc_id"), "left_anti")
            }
          val k = keep.persist()
          try {
            // idempotent corpus write: same batch ⇒ same directory
            k.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
            if (!s.catalog.tableExists(s"${table}_bands"))
              Dedup.initLshIndex(k, table, location = Some(indexDir))
            else {
              // index append guarded by ids already present
              val seen = s.table(s"${table}_sigs").select(col("doc_id"))
              Dedup.appendToLshIndex(
                k.join(seen, Seq("doc_id"), "left_anti"), table)
            }
          } finally { k.unpersist(); () }
        } finally { batchKept.unpersist(); () }
      }
      .start()
}
