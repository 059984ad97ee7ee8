package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ingest.{Transform, WikidataSource}
import graft.query.{Ops, Paths}
import graft.ingest.Load.WikiTables

/** Streaming Wikidata ingest + incremental materialized-view
  * maintenance (SURVEY §7 / B16's Structured-Streaming extension).
  *
  * The batch normalize pipeline is stateless per-row, so it runs
  * UNCHANGED over `readStream.text` of a dump directory — new dump
  * files stream in as they land. On top of it,
  * [[incrementalMediaView]] maintains the reference's Media view
  * (episodes/parent/children) incrementally: each micro-batch
  * computes view rows for the arriving entities only and upserts them
  * into the materialized parquet by id — the view stays fresh without
  * recomputing history. (`foreachBatch` + anti-join merge: the
  * pattern Delta's MERGE automates; on plain parquet the rewrite is
  * explicit. At cluster scale the view would be id-partitioned so the
  * merge rewrites only touched partitions.)
  */
object WikiStream {

  /** Streaming variant of WikidataSource.read + Transform.normalize:
    * one row per entity, same columns as the batch path. */
  def normalizedStream(spark: SparkSession, dumpDir: String,
                       lang: String = "en"): DataFrame =
    Transform.normalize(
      WikidataSource.entities(
        WikidataSource.fromLines(spark.readStream.text(dumpDir))),
      lang)

  /** Media-view rows for one micro-batch. No join: an arriving
    * entity carries its own claims array, so its view row derives
    * locally — the incremental path never touches the claims table
    * (the batch `Ops.mediaView` needs the join only because it reads
    * the already-split tables). */
  private def mediaRows(normalized: DataFrame): DataFrame =
    normalized.filter(col("id.tb") === "Entity").select(
      col("id"), col("label"),
      struct(lit("Claims").as("tb"), col("id.id").as("id")).as("claims"),
      col("description"),
      Paths.quantityAmount(col("claims_arr"), 1113).as("episodes"),
      Paths.thing(col("claims_arr"), 179).as("parent"),
      Paths.things(col("claims_arr"), 527).as("children"))

  /** Start the incremental view: dump files land in `dumpDir`, the
    * view materializes at `viewDir`. Returns the running query;
    * `processAllAvailable()` to drain synchronously. */
  def incrementalMediaView(spark: SparkSession, dumpDir: String,
                           viewDir: String, checkpoint: String,
                           lang: String = "en"): StreamingQuery =
    normalizedStream(spark, dumpDir, lang).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val updates = mediaRows(batch).cache()
        try {
          // crash-safe staged swap on plain parquet: write the merged
          // view next to the live one, then directory-rename into
          // place (local rename is atomic). A crash between delete
          // and rename leaves the staged copy — recovered below. The
          // checkpointed micro-batch replays idempotently either way.
          // (Delta/Iceberg MERGE is the managed-table form of this.)
          val live = new java.io.File(viewDir)
          val staged = new java.io.File(viewDir + "_staged")
          val base =
            if (valid(live)) Some(viewDir)
            else if (valid(staged)) Some(staged.getPath) // crash recovery
            else None
          val merged = base match {
            case Some(dir) =>
              val existing = batch.sparkSession.read.parquet(dir)
              val upd = updates.select(col("id").as("_u_id"))
              existing.join(upd,
                  existing("id.tb") === col("_u_id.tb") &&
                    existing("id.id") === col("_u_id.id"),
                  "left_anti")
                .unionByName(updates)
            case None => updates
          }
          val next = new java.io.File(viewDir + "_next")
          merged.write.mode(SaveMode.Overwrite).parquet(next.getPath)
          deleteRecursively(staged)
          if (live.exists()) { live.renameTo(staged); () }
          next.renameTo(live)
          deleteRecursively(staged)
        } finally updates.unpersist()
      }
      .start()

  private def valid(dir: java.io.File): Boolean =
    dir.exists() && new java.io.File(dir, "_SUCCESS").exists()

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
