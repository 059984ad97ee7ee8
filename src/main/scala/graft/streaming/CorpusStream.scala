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
  * pairs) and the whole pipeline never recomputes history. A replayed
  * batch (crash before checkpoint commit) re-probes the same index —
  * its documents either dedup against their own earlier copies
  * (appended bands make the replay find them) or re-append
  * identically, so the OUTPUT corpus converges; exactly-once output
  * comes from the parquet commit protocol per batch directory.
  */
object CorpusStream {

  /** Start the online-dedup stream over `docsStream` (doc_id, text).
    * Within a batch, near-dup clusters keep their smallest doc_id;
    * across batches, earlier-ingested docs win. Survivors append to
    * `outDir`; the index lives in the `table` bucketed tables. */
  def onlineDedup(docsStream: DataFrame, table: String, outDir: String,
                  checkpoint: String,
                  minEst: Double = 0.5): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // within-batch first: minhashPairs emits doc_a < doc_b, so
        // dropping every doc_b keeps exactly the cluster minima
        val intra = Dedup.minhashPairs(batch, minEst = minEst)
          .select(col("doc_b").as("doc_id")).distinct()
        val batchKept = batch.join(intra, Seq("doc_id"), "left_anti")
          .persist()
        try {
          if (!s.catalog.tableExists(s"${table}_bands")) {
            Dedup.initLshIndex(batchKept, table)
            batchKept.write.mode("append").parquet(outDir)
          } else {
            val dupOfPrior = Dedup
              .dedupAgainstIndex(s, batchKept, table, minEst)
              .select(col("new_id").as("doc_id")).distinct()
            val keep = batchKept.join(dupOfPrior, Seq("doc_id"), "left_anti")
              .persist()
            try {
              Dedup.appendToLshIndex(keep, table)
              keep.write.mode("append").parquet(outDir)
            } finally { keep.unpersist(); () }
          }
        } finally { batchKept.unpersist(); () }
      }
      .start()
}
