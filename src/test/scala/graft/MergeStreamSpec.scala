package graft

import java.nio.file.{Files => JF, Paths => JP}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge
import graft.streaming.MergeStream

/** The CDC-apply stream over the versioned merge target: stream
  * progress publishes versions, readers time-travel across them, and
  * at-least-once redelivery converges (skip at the high-water mark;
  * idempotent re-merge inside the crash window). */
class MergeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def state(path: String, v: Int = -1): Map[Long, Long] =
    Merge.readVersioned(spark, path, v).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("scd2: change closes, no-op is invisible, valid_from survives a second closing") {
    import spark.implicits._
    val dim0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .select(col("k"), col("v"), lit(0).as("valid_from"),
        lit(null).cast("int").as("valid_to"), lit(true).as("is_current"))
    // batch 1: k=1 changed, k=2 NO-OP (identical image), k=4 new, k=3 absent
    val dim1 = Merge.scd2Apply(dim0,
      Seq((1L, "a2"), (2L, "b"), (4L, "d")).toDF("k", "v"), "k", 1)
    val rows1 = dim1.collect().map(r => (r.getLong(0), r.getString(1),
      r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4))).toSet
    assert(rows1 === Set(
      (1L, "a", 0, 1, false), (1L, "a2", 1, -1, true),
      (2L, "b", 0, -1, true),              // no-op: no phantom version
      (3L, "c", 0, -1, true),
      (4L, "d", 1, -1, true)))
    // batch 2: k=1 changes AGAIN — its batch-1 row must close carrying
    // valid_from=1, and the batch-0 row must stay untouched
    val dim2 = Merge.scd2Apply(dim1, Seq((1L, "a3")).toDF("k", "v"), "k", 2)
    val rows2 = dim2.collect().map(r => (r.getLong(0), r.getString(1),
      r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4))).toSet
    assert(rows2 === Set(
      (1L, "a", 0, 1, false), (1L, "a2", 1, 2, false), (1L, "a3", 2, -1, true),
      (2L, "b", 0, -1, true), (3L, "c", 0, -1, true), (4L, "d", 1, -1, true)))
  }

  test("end-to-end stream: each file batch publishes a version; latest state correct") {
    val base = JF.createTempDirectory("ms_e2e").toString
    val t = spark.range(0, 100).select(col("id").as("k"), lit(0L).as("v"))
    Merge.writeVersioned(t, s"$base/target", "k", nBuckets = 4)
    JF.createDirectories(JP.get(s"$base/in"))
    JF.writeString(JP.get(s"$base/in/d1.json"),
      """{"k": 1, "v": 11}""" + "\n" + """{"k": 500, "v": 55}""")
    val q = MergeStream.upsertStream(
      spark.readStream.schema("k LONG, v LONG").json(s"$base/in"),
      s"$base/target", "k", s"$base/cp")
    try {
      q.processAllAvailable()
      val s1 = state(s"$base/target")
      assert(s1.size === 101 && s1(1L) === 11L && s1(500L) === 55L)
      // second file → second batch → next version
      JF.writeString(JP.get(s"$base/in/d2.json"), """{"k": 1, "v": 12}""")
      q.processAllAvailable()
      val s2 = state(s"$base/target")
      assert(s2.size === 101 && s2(1L) === 12L && s2(500L) === 55L)
      // time travel: the pre-batch-2 state is still addressable
      val versions = Merge.versions(s"$base/target")
      assert(versions.size === 3) // v0 + one per batch
      assert(state(s"$base/target", versions(1))(1L) === 11L)
    } finally q.stop()
  }

  test("redelivered batch at the high-water mark is skipped; crash-window replay converges") {
    val base = JF.createTempDirectory("ms_replay").toString
    val t = spark.range(0, 50).select(col("id").as("k"), lit(0L).as("v"))
    Merge.writeVersioned(t, s"$base/t", "k", nBuckets = 4)
    val d1 = spark.createDataFrame(Seq(1L -> 10L)).toDF("k", "v")
    MergeStream.applyBatch(spark, s"$base/t", "k", d1, 0L, "lineA")
    assert(MergeStream.lastApplied(s"$base/t", "lineA") === 0L)
    val versionsAfter = Merge.versions(s"$base/t")
    // clean redelivery: same batchId → no new version, state unchanged
    MergeStream.applyBatch(spark, s"$base/t", "k", d1, 0L, "lineA")
    assert(Merge.versions(s"$base/t") === versionsAfter)
    assert(state(s"$base/t")(1L) === 10L)
    // crash window: manifest published but hwm write lost — simulate
    // by re-merging the delta directly, as the replay would
    Merge.mergeVersioned(spark, s"$base/t", d1, "k")
    val sExtra = state(s"$base/t")
    assert(sExtra.size === 50 && sExtra(1L) === 10L,
      "replayed merge must carry an identical state (idempotent upsert)")
    // and the next batch proceeds normally on top
    MergeStream.applyBatch(spark, s"$base/t", "k",
      spark.createDataFrame(Seq(2L -> 20L)).toDF("k", "v"), 1L, "lineA")
    val s2 = state(s"$base/t")
    assert(s2(1L) === 10L && s2(2L) === 20L)
    assert(MergeStream.lastApplied(s"$base/t", "lineA") === 1L)
  }

  test("a restarted stream with a fresh checkpoint is a NEW lineage: batch 0 applies") {
    val base = JF.createTempDirectory("ms_lineage").toString
    val t = spark.range(0, 20).select(col("id").as("k"), lit(0L).as("v"))
    Merge.writeVersioned(t, s"$base/t", "k", nBuckets = 4)
    // old lineage ran far ahead
    MergeStream.applyBatch(spark, s"$base/t", "k",
      spark.createDataFrame(Seq(1L -> 10L)).toDF("k", "v"), 40L, "oldCp")
    // ops recovery: new checkpoint → new identity → its batch 0 is
    // NOT swallowed by the old lineage's high-water mark
    val newId = MergeStream.streamId(s"$base/cp_fresh")
    assert(newId !== MergeStream.streamId(s"$base/cp_old"))
    MergeStream.applyBatch(spark, s"$base/t", "k",
      spark.createDataFrame(Seq(2L -> 20L)).toDF("k", "v"), 0L, newId)
    val s2 = state(s"$base/t")
    assert(s2(1L) === 10L && s2(2L) === 20L,
      "fresh-checkpoint batch 0 must apply")
  }

  test("compaction folds fragmented buckets into single files, state and history intact") {
    val base = JF.createTempDirectory("ms_compact").toString
    val t = spark.range(0, 200).select(col("id").as("k"), lit(0L).as("v"))
    Merge.writeVersioned(t, s"$base/t", "k", nBuckets = 4)
    // a short CDC run: every batch touches bucket(s) → fragments
    (1L to 5L).foreach { i =>
      MergeStream.applyBatch(spark, s"$base/t", "k",
        spark.createDataFrame(Seq(i -> (i * 100))).toDF("k", "v"), i, "cp")
    }
    val before = state(s"$base/t")
    val versionsBefore = Merge.versions(s"$base/t")
    val newV = Merge.compactVersioned(spark, s"$base/t", "k")
    assert(newV === versionsBefore.last + 1)
    // state byte-identical
    assert(state(s"$base/t") === before)
    // every live bucket is one file now
    val (_, entries) = {
      val v = Merge.versions(s"$base/t").last
      val f = new java.io.File(s"$base/t/_manifests", s"v$v.tsv")
      val lines = JF.readString(f.toPath).linesIterator.toList
      (lines.head, lines.tail.filter(_.nonEmpty).map(_.split("\t")(1)))
    }
    entries.foreach { rel =>
      val files = Option(new java.io.File(s"$base/t/$rel").listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
      assert(files === 1, s"$rel has $files files after compaction")
    }
    assert(entries.forall(_.startsWith(s"_data/v$newV/")))
    // history intact: the pre-compaction version still reconstructs
    assert(state(s"$base/t", versionsBefore.last) === before)
    // vacuum then reclaims everything but the compacted version
    Merge.vacuum(s"$base/t", keepLast = 1)
    assert(Merge.versions(s"$base/t") === Seq(newV))
    assert(state(s"$base/t") === before)
  }

  test("compaction + vacuum under a LIVE CDC stream: no lost version, no torn read") {
    // merge → compact → merge → vacuum interleaved with a running
    // upsertStream, a historical reader pinned to the pre-compaction
    // version throughout (single-writer contract: compaction runs
    // between micro-batches — the stream is live, just quiescent)
    val base = JF.createTempDirectory("ms_live_compact").toString
    val t = spark.range(0, 100).select(col("id").as("k"), lit(0L).as("v"))
    Merge.writeVersioned(t, s"$base/t", "k", nBuckets = 4)
    JF.createDirectories(JP.get(s"$base/in"))
    val q = MergeStream.upsertStream(
      spark.readStream.schema("k LONG, v LONG").json(s"$base/in"),
      s"$base/t", "k", s"$base/cp")
    try {
      // batch 1 → v1
      JF.writeString(JP.get(s"$base/in/d1.json"),
        """{"k": 1, "v": 11}""" + "\n" + """{"k": 200, "v": 22}""")
      q.processAllAvailable()
      val v1 = Merge.versions(s"$base/t").last
      // pin a reader to the pre-compaction version: the plan resolves
      // v1's manifest ONCE; its directories must stay byte-stable
      val pinned = Merge.readVersioned(spark, s"$base/t", v1)
      val c1 = pinned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(c1.size === 101 && c1(1L) === 11L && c1(200L) === 22L)
      // compact WHILE the stream is live → v2
      val v2 = Merge.compactVersioned(spark, s"$base/t", "k")
      assert(v2 === v1 + 1)
      // batch 2 lands on top of the compacted version → v3
      JF.writeString(JP.get(s"$base/in/d2.json"), """{"k": 1, "v": 12}""")
      q.processAllAvailable()
      val v3 = Merge.versions(s"$base/t").last
      assert(v3 === v2 + 1, "stream must keep publishing after compaction")
      val latest = state(s"$base/t")
      assert(latest.size === 101 && latest(1L) === 12L && latest(200L) === 22L)
      // the pinned reader re-reads IDENTICALLY across compact + merge
      assert(pinned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === c1)
      // vacuum keeping the pinned version: v0 goes, v1..v3 stay
      Merge.vacuum(s"$base/t", keepLast = 3)
      assert(Merge.versions(s"$base/t") === Seq(v1, v2, v3))
      assert(pinned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === c1,
        "vacuum within retention must not tear the pinned read")
      // the stream keeps going after vacuum too → v4
      JF.writeString(JP.get(s"$base/in/d3.json"), """{"k": 3, "v": 33}""")
      q.processAllAvailable()
      val s4 = state(s"$base/t")
      assert(s4(3L) === 33L && s4(1L) === 12L && s4.size === 101)
    } finally q.stop()
  }

  test("vacuum never touches an in-flight (unpublished) version directory") {
    val base = JF.createTempDirectory("ms_vac").toString
    val t = spark.range(0, 30).select(col("id").as("k"), lit(0L).as("v"))
    Merge.writeVersioned(t, s"$base/t", "k", nBuckets = 4)
    Merge.mergeVersioned(spark, s"$base/t",
      spark.createDataFrame(Seq(1L -> 10L)).toDF("k", "v"), "k")
    // simulate a merge mid-flight: buckets moved into _data/v2, no
    // manifest published yet
    val inFlight = new java.io.File(s"$base/t/_data/v2/_mb=0")
    JF.createDirectories(inFlight.toPath)
    JF.writeString(JP.get(s"${inFlight.getPath}/part-0.parquet"), "x")
    val removed = Merge.vacuum(s"$base/t", keepLast = 1)
    assert(inFlight.exists(),
      "vacuum must not delete a version above the latest published manifest")
    assert(removed.forall(!_.startsWith("_data/v2")), removed.toString)
  }
}
