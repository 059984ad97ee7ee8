package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Pins the corpus-curation operators against hand-computed truth on
  * planted documents (the oracle gate covers the full tables; these
  * cover the semantics on known content). */
class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.HashExpressions.register(s)
    s
  }

  private def docsDf(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetition signals: hand-computed fractions on planted docs") {
    // "a a a b": top word a=3/4; bigrams [a a, a a, a b] → dup 1-2/3
    val out = Corpus.repetitionSignals(
        docsDf(1L -> "a a a b", 2L -> "w x y z"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 0.75, 0.3333)))
    assert(out(2L) === ((4L, 0.25, 0.0))) // all distinct: no repetition
  }

  test("boilerplate: shared shingle flagged at threshold, unique text not") {
    // "common header here" appears in 3 docs (minDocs=3); doc 4 is clean
    val df = docsDf(
      1L -> "common header here alpha beta gamma",
      2L -> "common header here delta epsilon zeta",
      3L -> "common header here eta theta iota",
      4L -> "nothing shared at all in this one")
    val out = Corpus.boilerplateSignals(df, col("text"), minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each doc has 4 distinct shingles; only "common header here" is boiler
    assert(out(1L) === ((4L, 1L)) && out(2L) === ((4L, 1L)) &&
      out(3L) === ((4L, 1L)))
    assert(out(4L)._2 === 0L)
  }

  test("pii scrub: planted email and phone redacted, counts exact") {
    val df = docsDf(1L -> "mail me at jo.doe@site.org or call 555-1234 now",
      2L -> "no pii here at all")
    val audited = Corpus.piiAudit(df, col("text")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(audited(1L) === ((1, 1)) && audited(2L) === ((0, 0)))
    val scrubbed = df.select(col("doc_id"), Corpus.scrubPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed(1L) === "mail me at <EMAIL> or call <PHONE> now")
    assert(scrubbed(2L) === "no pii here at all")
  }

  test("stratified sample: small classes intact, large classes near cap, deterministic") {
    val s = spark; import s.implicits._
    val df = ((1L to 200L).map(i => (i, "big")) ++
      (201L to 205L).map(i => (i, "small"))).toDF("doc_id", "src")
    val kept = Corpus.stratifiedSample(df, col("src"), col("doc_id"), cap = 20)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") === 5L) // under cap: keep all
    // rate 0.1 of 200 → expected 20; md5 buckets are uniform enough for 3x
    assert(bySrc("big") > 0L && bySrc("big") < 60L, bySrc.toString)
    val again = Corpus.stratifiedSample(df, col("src"), col("doc_id"), cap = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a null class is a class: below-cap null-source docs are kept
    val withNull = ((301L to 303L).map(i => (i, null: String)) ++
      (1L to 5L).map(i => (i, "s"))).toDF("doc_id", "src")
    val keptNull = Corpus.stratifiedSample(
        withNull, col("src"), col("doc_id"), cap = 20)
      .filter(col("src").isNull).count()
    assert(keptNull === 3L, "null-class docs must not be dropped")
  }

  test("curation stream: one-batch stream equals the batch operators") {
    val base = java.nio.file.Files.createTempDirectory("curation_one").toString
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    // the whole corpus in a single micro-batch ⇒ the accumulated
    // docfreq IS the batch docfreq ⇒ stream output ≡ batch operators
    graft.streaming.CorpusStream.curationStage(
      docs, 0L, s"$base/state", s"$base/out", minDocs = 5)
    val streamed = spark.read.parquet(s"$base/out/batch=0")
    val batch = Corpus.repetitionSignals(docs, col("text"))
      .join(Corpus.boilerplateSignals(docs, col("text"), minDocs = 5),
        Seq("doc_id"))
      .join(Corpus.piiAudit(docs, col("text")), Seq("doc_id"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch.select(streamed.columns.map(col): _*))
      .count() === 0L)
  }

  test("curation stream: docfreq accumulates across batches; replay is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("curation_two").toString
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    graft.streaming.CorpusStream.curationStage(
      b1, 0L, s"$base/state", s"$base/out", minDocs = 5)
    graft.streaming.CorpusStream.curationStage(
      b2, 1L, s"$base/state", s"$base/out", minDocs = 5)
    // state after both batches = the batch-mode docfreq (each doc's
    // shingles land in exactly one partial)
    val stateDf = spark.read.parquet(s"$base/state")
      .groupBy("sh").agg(sum("df_part").as("docfreq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchDf = Corpus.shingleSet(docs, col("text"))
      .groupBy("sh").agg(countDistinct("doc_id").as("docfreq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stateDf === batchDf)
    // batch 2 is scored against state from BOTH batches ⇒ its rows
    // match the all-docs batch scoring restricted to batch-2 ids
    val streamed2 = spark.read.parquet(s"$base/out/batch=1")
    val batchAll = Corpus.repetitionSignals(docs, col("text"))
      .join(Corpus.boilerplateSignals(docs, col("text"), minDocs = 5),
        Seq("doc_id"))
      .join(Corpus.piiAudit(docs, col("text")), Seq("doc_id"))
      .filter(col("doc_id") % 2 === 1)
    assert(streamed2.exceptAll(
      batchAll.select(streamed2.columns.map(col): _*)).count() === 0L)
    // at-least-once replay of batch 1: partials/outputs overwrite in
    // place — nothing double-counts, outputs unchanged
    val before = streamed2.collect().map(_.toString).sorted
    graft.streaming.CorpusStream.curationStage(
      b2, 1L, s"$base/state", s"$base/out", minDocs = 5)
    val after = spark.read.parquet(s"$base/out/batch=1")
      .collect().map(_.toString).sorted
    assert(after === before)
    assert(spark.read.parquet(s"$base/state")
      .groupBy("sh").agg(sum("df_part").as("docfreq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === batchDf)
  }

  test("curation stream: end-to-end via foreachBatch plumbing") {
    val base = java.nio.file.Files.createTempDirectory("curation_e2e").toString
    import java.nio.file.{Files => JF, Paths => JP}
    JF.createDirectories(JP.get(s"$base/in"))
    JF.writeString(JP.get(s"$base/in/f1.json"),
      """{"doc_id": 1, "text": "alpha beta gamma delta epsilon"}""" + "\n" +
        """{"doc_id": 2, "text": "mail jo@x.io or 555-0000 fast"}""")
    val q = graft.streaming.CorpusStream.curationStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .json(s"$base/in"),
      s"$base/state", s"$base/out", s"$base/cp", minDocs = 2)
    try {
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Int]("n_emails")).toMap
      assert(out === Map(1L -> 0, 2L -> 1))
    } finally { q.stop() }
  }

  test("token budget: cumsum bounded and prefix-closed in bucket order") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => (i, "cls", 10L)).toDF("doc_id", "src", "est")
    val kept = Corpus.tokenBudgetSample(df, col("src"), col("doc_id"),
        col("est"), budget = 95L)
      .select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.length === 9) // 9 docs * 10 tokens = 90 <= 95 < 100
    assert(kept.forall(_._2 <= 95L))
    // prefix-closed: the kept set is exactly the first k in bucket order
    val order = df.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long").as("b"))
      .orderBy("b", "doc_id").collect().map(_.getLong(0)).take(9).toSet
    assert(kept.map(_._1).toSet === order)
  }

  test("chunking: window/stride arithmetic on short, exact and overlapping docs") {
    val df = docsDf(
      1L -> "a b c",                    // n=3 < window → 1 chunk of 3
      2L -> "a b c d e",                // n=5 = window → 1 chunk of 5
      3L -> (1 to 12).map(i => s"t$i").mkString(" ")) // n=12, W=5,S=3 → ceil(7/3)+1=4 chunks
    val out = Corpus.chunkDocs(df, window = 5, stride = 3)
      .select("doc_id", "chunk_id", "tok_start", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.filter(_._1 == 1L) === Seq((1L, 0L, 0L, 3L)))
    assert(out.filter(_._1 == 2L) === Seq((2L, 0L, 0L, 5L)))
    assert(out.filter(_._1 == 3L) === Seq(
      (3L, 0L, 0L, 5L), (3L, 1L, 3L, 5L), (3L, 2L, 6L, 5L), (3L, 3L, 9L, 3L)))
    // overlap property: consecutive chunks share window-stride tokens,
    // and the chunk set covers every token position
    val d3 = out.filter(_._1 == 3L)
    d3.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + 3, "stride")
      assert(a._3 + a._4 >= b._3, "no gap")
    }
    assert(d3.last._3 + d3.last._4 === 12L, "tail covered")
  }

  test("sequence packing: offsets tile the corpus exactly and chunks respect the budget") {
    val s = spark; import s.implicits._
    // varied doc lengths, budget 7 → spans cross chunk cuts
    val df = (1L to 60L).map(i => (i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Corpus.packSequences(df, col("doc_id"),
        size(split(col("text"), " ")), budget = 7L, bucketChars = 1)
      .select("doc_id", "n_tokens", "tok_offset", "seq_first", "seq_last")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._3)
    // exact tiling: first offset 0, each next = prev offset + prev len
    assert(out.head._3 === 0L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + a._2, s"gap/overlap between ${a._1} and ${b._1}")
    }
    // chunk ids derive from the offsets at the declared budget
    out.foreach { case (id, n, off, first, last) =>
      assert(first === off / 7, s"doc $id seq_first")
      assert(last === (off + n - 1) / 7, s"doc $id seq_last")
      assert(last >= first)
    }
    // layout is the md5 total order (engine-stable determinism)
    val expected = df.select(col("doc_id"))
      .withColumn("k", md5(col("doc_id").cast("string")))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(out.map(_._1).toSeq === expected)
  }

  test("dsir weights: target-distribution documents score higher") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val w = Corpus.dsirWeights(docs, col("text"), col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_weight") / col("n_bigrams")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // per-bigram mean log-ratio must separate en (target) from rest.
    // (No absolute-sign claim: add-one smoothing over 1024 buckets
    // biases every ratio slightly negative when the target sample is
    // small — the selection signal is the GAP, which resampling ranks
    // on.)
    assert(w(true) > w(false) + 0.05,
      s"en mean ${w(true)} should clearly exceed non-en ${w(false)}")
  }
}
