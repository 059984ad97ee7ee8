package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract /
  * frame-sample stages as partition-wise typed transforms.
  *
  * The Spark-side design is the real deliverable here and is fully
  * exercised: schema (binary payload + metadata struct), partition
  * batching (`mapPartitions` over a typed Dataset — the Scala
  * equivalent of `mapInPandas`: one iterator per partition so a codec
  * can amortize per-batch init), and the column contracts each stage
  * consumes/produces. The codec itself is STUBBED (no image/audio
  * libraries in this environment) behind [[StubCodec]] — a
  * deterministic fake keyed on the payload bytes — with the single
  * seam `MediaCodec` to swap a real JNI/ffmpeg codec in.
  *
  * At 100 TB: binary payloads dominate row size, so stages that don't
  * need the payload must prune it (`decoded.drop("media")` happens at
  * the scan thanks to nested pruning); feature extraction is
  * shuffle-free; the only exchange in the pipeline is whatever
  * downstream analytics (e.g. ANN over the features) introduces.
  */
object Multimodal {

  /** One media row: payload + the typed metadata every stage shares. */
  final case class MediaRow(doc_id: Long, media: Array[Byte],
                            kind: String, n_bytes: Int)
  /** Decoded/para-extracted record: fixed-width feature vector +
    * sampled frame offsets (video) — payload dropped. */
  final case class MediaFeatures(doc_id: Long, kind: String,
                                 width: Int, height: Int,
                                 features: Array[Float],
                                 frame_offsets: Array[Int])

  /** The codec seam. A real implementation wraps libjpeg/ffmpeg with
    * per-partition init; the stub derives everything deterministically
    * from the bytes so the plumbing is testable end-to-end. */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  object StubCodec extends MediaCodec {
    // ??? in a real deployment: replace with actual decode. The stub
    // fakes dimensions from a rolling byte hash and features from
    // fixed byte strides — deterministic, schema-true.
    def decode(r: MediaRow): MediaFeatures = {
      var h = 17L
      var i = 0
      while (i < r.media.length) { h = h * 31 + (r.media(i) & 0xff); i += 1 }
      val width = 64 + math.floorMod(h, 64).toInt
      val height = 64 + math.floorMod(h >> 8, 64).toInt
      val features = Array.tabulate(8) { j =>
        if (r.media.isEmpty) 0f
        else (r.media(j * r.media.length / 8) & 0xff) / 255f
      }
      val frames =
        if (r.kind == "video") Array.range(0, r.media.length, 1024) else Array.empty[Int]
      MediaFeatures(r.doc_id, r.kind, width, height, features, frames)
    }
  }

  /** Stand-in media table: the documents' UTF-8 bytes as payload
    * (source→binary ingestion plumbing; a real pipeline reads
    * `binaryFile` sources or parquet with binary columns). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"))
      .withColumn("n_bytes", length(col("media")))

  /** Partition-wise decode: one codec instance per partition, rows
    * streamed through it (the mapInPandas batch shape). */
  def decodeAll(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init seam (real codecs allocate here)
      it.map(codec.decode)
    }
  }

  /** Resize stage: cap the longer side at `maxDim`, preserving aspect
    * ratio (integer truncation, floorMod-free: dims are positive).
    * Payload-free typed map over the decoded records — the stage a
    * real pipeline runs between decode and feature extraction; the
    * stub keeps features unchanged (a real codec would re-extract). */
  def resizeAll(decoded: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { f =>
      val longer = math.max(f.width, f.height)
      if (longer <= maxDim) f
      else {
        val scale = maxDim.toDouble / longer
        f.copy(width = math.max(1, (f.width * scale).toInt),
          height = math.max(1, (f.height * scale).toInt))
      }
    }
  }

  /** Frame-sampling stage: one row per sampled frame of each video —
    * the explode that feeds per-frame models downstream. Offsets come
    * from the decode stage (every 1024 payload bytes in the stub). */
  def frameRows(decoded: DataFrame): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("doc_id"),
        posexplode(col("frame_offsets")).as(Seq("frame_no", "offset")))

  /** Metadata projection — payload-pruned scan (check ReadSchema:
    * `media` is still read here because n_bytes/hash derive from it;
    * a metadata-only query prunes it entirely). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"), col("kind"), col("n_bytes"),
      md5(col("media")).as("content_hash"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mediaMeta _),
    "mm_decode" -> ((s, dir) => {
      val d = decodeAll(mediaTable(s, dir)).toDF()
      d.select(col("doc_id"), col("kind"), col("width"), col("height"),
        size(col("features")).as("n_features"),
        size(col("frame_offsets")).as("n_frames"))
    }),
    // frame offsets are payload-length-derived (every 1024 bytes), so
    // the explode is fully SQL-oracle-checkable — the one multimodal
    // stage whose output is engine-independent
    "mm_frames" -> ((s, dir) =>
      frameRows(decodeAll(mediaTable(s, dir)).toDF())))

  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes, md5(text) AS content_hash FROM documents",
    "mm_frames" ->
      "SELECT doc_id, CAST(off / 1024 AS INTEGER) AS frame_no, CAST(off AS INTEGER) AS offset FROM (SELECT doc_id, unnest(range(0, octet_length(CAST(text AS BLOB)), 1024)) AS off FROM documents WHERE doc_id % 3 = 2)",
    // the stub codec is DETERMINISTIC arithmetic over the payload
    // bytes (rolling h=h*31+b hash mod 2^64), so the whole decode
    // stage oracles in SQL: HUGEINT arithmetic restates the unsigned
    // 64-bit hash, floorMod(h>>8,64) ≡ (hu//256)%64 on the unsigned
    // value (mod-64 reads bits 8..13 regardless of shift signedness),
    // bytes ≡ codepoints because the corpus is ASCII (verified).
    // Hash equality proves the mapPartitions decode seam delivers
    // exact per-row outputs independent of partitioning.
    "mm_decode" ->
      """WITH h AS (SELECT doc_id, list_reduce(list_prepend(CAST(17 AS HUGEINT), list_transform(range(1, length(text)+1), i -> CAST(unicode(text[i]) AS HUGEINT))), (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS hu, octet_length(encode(text)) AS n_bytes FROM documents) SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, 64 + CAST(hu % 64 AS INTEGER) AS width, 64 + CAST((hu // 256) % 64 AS INTEGER) AS height, 8 AS n_features, CASE WHEN doc_id % 3 = 2 AND n_bytes > 0 THEN CAST((n_bytes - 1) // 1024 + 1 AS INTEGER) ELSE 0 END AS n_frames FROM h""")
}
