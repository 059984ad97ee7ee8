package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Corpus

/** Properties of sequence packing over ARBITRARY corpora: whatever the
  * doc-length distribution and budget, the emitted offsets must tile
  * the concatenated token stream exactly ([0, total) with no gap or
  * overlap) and the chunk ids must be the offset arithmetic at the
  * declared budget — including docs longer than the budget (spanning
  * 3+ chunks) and budget=1 (every token its own chunk). Spark-driven,
  * so the case count is kept small; each case is a full distributed
  * run of the two-level prefix sum. */
object PackProps extends Properties("PackSequences") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  private val corpusGen: Gen[List[Int]] = // doc token-lengths
    Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 25)))
  private val budgetGen: Gen[Long] = Gen.oneOf(1L, 2L, 7L, 16L, 1024L)

  property("offsets tile [0,total) and chunk ids are offset arithmetic") =
    forAll(corpusGen, budgetGen) { (lens, budget) =>
      val s = spark; import s.implicits._
      val df = lens.zipWithIndex
        .map { case (len, i) => (i.toLong, Seq.fill(len)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val out = Corpus.packSequences(df, col("doc_id"),
          size(split(col("text"), " ")), budget, bucketChars = 1)
        .select("n_tokens", "tok_offset", "seq_first", "seq_last")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._2)
      val total = lens.map(_.toLong).sum
      val tiles = out.head._2 == 0L &&
        out.sliding(2).forall {
          case Array(a, b) => b._2 == a._2 + a._1
          case _ => true
        } && (out.last._2 + out.last._1 == total)
      val chunks = out.forall { case (n, off, first, last) =>
        first == off / budget && last == (off + n - 1) / budget
      }
      Prop(tiles) :| s"tiling broke (budget=$budget lens=$lens)" &&
        Prop(chunks) :| s"chunk math broke (budget=$budget)"
    }
}
