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

  test("nb quality model: agrees with its weak labels on separable docs") {
    val s = spark; import s.implicits._
    // 20 clearly-good docs (12 tokens, sane word lengths) and 20
    // clearly-bad one-word docs: NB trained on the Gopher flag must
    // reproduce it when the classes are this separated
    val good = (1L to 20L).map(i =>
      (i, ("the quick brown fox jumps over lazy dogs near " +
        s"river bend $i")))
    val bad = (21L to 40L).map(i => (i, s"x$i"))
    val df = (good ++ bad).toDF("doc_id", "text")
    val out = Corpus.nbQualityModel(df, col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    good.foreach { case (id, _) => assert(out(id), s"doc $id should keep") }
    bad.foreach { case (id, _) => assert(!out(id), s"doc $id should drop") }
  }

  test("nb quality model: scores are partitioning-independent") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    def run(parts: Int) =
      Corpus.nbQualityModel(docs.repartition(parts), col("text"))
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(run(3) === run(13))
  }

  test("temperature mix: exact integer quotas, prefix-closed selection") {
    val s = spark; import s.implicits._
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 500L).map(i => (i, "mid")) ++
      (501L to 504L).map(i => (i, "tiny"))).toDF("doc_id", "src")
    val out = Corpus.temperatureMix(df, col("src"), col("doc_id"),
      total = 100L, alphaPct = 50)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas = (100 * round(sqrt(n)*1e6)) DIV sum: sqrt flattens the
    // 100:25:1 ratio to 20:10:2
    val w = Map("big" -> math.round(math.sqrt(400.0) * 1e6),
      "mid" -> math.round(math.sqrt(100.0) * 1e6),
      "tiny" -> math.round(math.sqrt(4.0) * 1e6))
    val sumw = w.values.sum
    val avail = Map("big" -> 400L, "mid" -> 100L, "tiny" -> 4L)
    // a flattened quota can exceed a tiny source's size — selection
    // is without replacement, so the source contributes all it has
    w.foreach { case (src, ws) =>
      assert(bySrc(src) === math.min((100L * ws) / sumw, avail(src)), src) }
    // α=100 (no temperature) recovers proportional quotas
    val prop = Corpus.temperatureMix(df, col("src"), col("doc_id"),
        total = 100L, alphaPct = 100)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop("big") === (100L * 400L * 1000000L) / (504L * 1000000L))
    // deterministic: the selected set is identical across partitionings
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.temperatureMix(df.repartition(7), col("src"),
        col("doc_id"), total = 100L, alphaPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // prefix-closed: shrinking the total selects a subset
    val small = Corpus.temperatureMix(df, col("src"), col("doc_id"),
        total = 50L, alphaPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }

  test("tfidf similarity: near-dup pair found, df pruning drops hot features") {
    val s = spark; import s.implicits._
    import graft.operators.TextAnalysis
    // docs 1/2 share a rare 5-token run (near-dups); "common phrase
    // here" is planted in ALL 6 docs so df=6 > maxDf=3 prunes it —
    // without pruning it would link every doc to every other
    val base = "alpha beta gamma delta epsilon"
    val df = Seq(
      1L -> s"common phrase here $base one",
      2L -> s"common phrase here $base two",
      3L -> "common phrase here x1 y1 z1 w1 v1",
      4L -> "common phrase here x2 y2 z2 w2 v2",
      5L -> "common phrase here x3 y3 z3 w3 v3",
      6L -> "common phrase here x4 y4 z4 w4 v4").toDF("doc_id", "text")
    val pairs = TextAnalysis.tfidfSimilarPairs(df, col("text"),
        maxDf = 3, minCosine = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set(1L -> 2L))
  }

  test("label centroids: exact means per (label, dim)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 3.0f), 0), (2L, Seq(3.0f, 5.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.labelCentroids(df)
      .collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out((0, 0)) === ((2L, 2.0)) && out((0, 1)) === ((2L, 4.0)))
    assert(out((1, 0)) === ((1L, 10.0)) && out((1, 1)) === ((1L, 20.0)))
  }

  test("length batches: full batches except per-bucket tails, bounded padding") {
    val s = spark; import s.implicits._
    // lengths 4-7 share bucket 2, 8-15 bucket 3
    val df = ((1L to 50L).map(i => (i, Seq.fill(4 + (i % 4).toInt)("w").mkString(" "))) ++
      (51L to 60L).map(i => (i, Seq.fill(9)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val out = Corpus.lengthBucketBatches(df, col("doc_id"),
        size(split(col("text"), " ")), batchSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    // bucket 2: 50 docs → batches of 8,8,8,8,8,8,2; bucket 3: 10 → 8,2
    val sizes2 = out.filter(_._1._1 == 2L).values.map(_._1).toSeq.sorted
    assert(sizes2 === Seq(2L, 8L, 8L, 8L, 8L, 8L, 8L))
    val sizes3 = out.filter(_._1._1 == 3L).values.map(_._1).toSeq.sorted
    assert(sizes3 === Seq(2L, 8L))
    // within a log2 bucket max/min < 2 → padding waste < 0.5 always
    assert(out.values.forall(_._3 < 0.5), out.toString)
    // deterministic across partitionings
    val again = Corpus.lengthBucketBatches(df.repartition(7), col("doc_id"),
        size(split(col("text"), " ")), batchSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(again === out)
  }

  test("vocab top-k: exact counts, ties broken on token") {
    val df = docsDf(1L -> "b b b a a c", 2L -> "a c d", 3L -> "e")
    val out = graft.operators.TextAnalysis.vocabTopK(df, col("text"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a=3, b=3 (tie → a first), c=2, then d/e tie at 1 → d
    assert(out.toSeq === Seq("a" -> 3L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
  }

  test("drift stream: accumulated stream PSI equals the batch operator; replay idempotent") {
    val s = spark; import s.implicits._
    import graft.streaming.DriftStream
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    // reference: values 1..100; two batches drifted upward
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val b1 = Seq(5.0, 22.0, 47.0, 91.0, 91.0).toDF("v")
    val b2 = Seq(93.0, 95.0, 97.0, 99.0).toDF("v")
    val model = DriftStream.fitReference(ref, col("v"))
    DriftStream.driftStage(b1, 0L, model, col("v"), s"$tmp/state", s"$tmp/out")
    DriftStream.driftStage(b2, 1L, model, col("v"), s"$tmp/state", s"$tmp/out")
    def rows(path: String) = spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // after batch 2 the accumulated candidate set is b1 ∪ b2 — the
    // batch operator on (ref marked true) ∪ (b1 ∪ b2 marked false)
    // must produce the identical per-bucket table
    val expect = graft.operators.Profile.psiDrift(
        ref.withColumn("is_ref", lit(true))
          .unionByName(b1.unionByName(b2).withColumn("is_ref", lit(false))),
        col("is_ref"), col("v")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(s"$tmp/out/batch=1") == expect)
    // replaying batch 0 (at-least-once delivery) overwrites its own
    // partial, so the accumulated state never double-counts b1: the
    // replayed report equals the batch-1 report (cumulative AT REPLAY
    // TIME — reports reflect everything ingested so far, by design)
    DriftStream.driftStage(b1, 0L, model, col("v"), s"$tmp/state", s"$tmp/out")
    assert(rows(s"$tmp/out/batch=0") == expect,
      "replayed batch-0 must see b1 exactly once plus b2")
    DriftStream.driftStage(b2, 1L, model, col("v"), s"$tmp/state", s"$tmp/out")
    assert(rows(s"$tmp/out/batch=1") == expect, "replay changed the PSI table")
  }

  test("domain cap: exact per-source cap, md5-coin order, small domains intact") {
    val s = spark; import s.implicits._
    // domain A: 6 docs (cap 3 must pick exactly 3 by coin order),
    // domain B: 2 docs (both survive)
    val df = ((0L to 5L).map(i => (i, "A")) ++ Seq((10L, "B"), (11L, "B")))
      .toDF("doc_id", "source")
    val out = Corpus.domainCap(df, col("source"), 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byDomain = out.groupBy(_._1)
    assert(byDomain("A").length == 3 && byDomain("B").length == 2)
    // truth: ascending (md5-16-bit coin, doc_id)
    def coin(id: Long): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
        .substring(0, 4), 16)
    val expectA = (0L to 5L).sortBy(i => (coin(i), i)).take(3)
    assert(byDomain("A").sortBy(_._3).map(_._2).toSeq == expectA,
      s"got ${byDomain("A").toSeq} want $expectA")
    // ranks are 1-based and dense per domain
    assert(byDomain("B").map(_._3).sorted.toSeq == Seq(1, 2))
  }
}
