package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Bpe

/** The batched BPE trainer must emit EXACTLY the sequential trainer's
  * merge table on arbitrary corpora — the guard in
  * [[Bpe.trainBatched]] claims provable equivalence (falling back to
  * one merge per pass when the proof fails), and this property is the
  * adversarial check of that claim. Tiny alphabets + short words
  * maximize pair-count ties, shared tokens between top pairs, and
  * merged-strings-colliding-with-existing-tokens — exactly the
  * interactions the guard must detect. Spark-driven, so the case
  * count is kept small; checkpointEvery=3 also exercises the lineage
  * truncation mid-run. */
object BpeProps extends Properties("BpeBatched") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // words over {a,b,c} with repeats → dense pair-count collisions;
  // the occasional non-BMP 😀 (a surrogate PAIR in UTF-16) pins that
  // all three trainers split words by CODEPOINT, not code units, and
  // the BMP private-use U+F000 creates ties where UTF-16 code-unit
  // order and codepoint order DISAGREE (D83D < F000 but
  // 0x1F600 > 0xF000) — exposing any String-'<' tie-break
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        3 -> Gen.oneOf("a", "b", "c"), 1 -> Gen.const("😀"),
        1 -> Gen.const("")))
        .map(_.mkString))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(3, 24).flatMap(n => Gen.listOfN(n, wordGen))
  private val mergesGen: Gen[Int] = Gen.chooseNum(1, 12)
  private val batchGen: Gen[Int] = Gen.oneOf(2, 4, 8)

  property("trainBatched ≡ train, merge for merge") =
    forAll(corpusGen, mergesGen, batchGen) { (words, nMerges, batchK) =>
      val s = spark; import s.implicits._
      val docs = words.grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toList.toDF("doc_id", "text")
      val seq = Bpe.train(docs, col("text"), nMerges).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toList
      val bat = Bpe.trainBatched(docs, col("text"), nMerges,
          batchK = batchK, checkpointEvery = 3).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toList
      val loc = Bpe.trainLocal(docs, col("text"), nMerges).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toList
      (Prop(seq == bat) :|
        s"batched diverged on words=$words nMerges=$nMerges batchK=$batchK\n" +
        s"  sequential=$seq\n  batched=$bat") &&
      (Prop(seq == loc) :|
        s"local diverged on words=$words nMerges=$nMerges\n" +
        s"  sequential=$seq\n  local=$loc")
    }
}
