package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.TopK.TopKBuffer

/** Properties of the bounded-heap top-k buffer — the kernel under
  * every similarity search's reduction. The aggregate's distributed
  * correctness reduces to exactly these: streaming insertion equals
  * sort-then-take, merge order never matters (partial aggregation
  * combines buffers in arbitrary order), and the shuffle's
  * serialize/deserialize round-trip is lossless. */
object TopKProps extends Properties("TopKBuffer") {

  private val entryGen: Gen[(Double, Long)] = for {
    s <- Gen.chooseNum(-1.0, 1.0)
    i <- Gen.chooseNum(0L, 50L) // narrow id range forces sim ties
  } yield (s, i)

  private val streamGen = Gen.listOf(entryGen)
  private val kGen = Gen.chooseNum(1, 8)

  /** Reference semantics: sim DESC, id ASC, distinct positions kept
    * as-is (duplicates allowed — the aggregate sees raw rows). */
  private def refTopK(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  private def fill(xs: Seq[(Double, Long)], k: Int): TopKBuffer = {
    val b = new TopKBuffer(k)
    xs.foreach { case (s, i) => b.add(s, i) }
    b
  }

  property("streaming insertion == sort-then-take") =
    forAll(streamGen, kGen) { (xs, k) =>
      fill(xs, k).sorted.toList == refTopK(xs, k)
    }

  property("merge is order-insensitive and equals the union's top-k") =
    forAll(streamGen, streamGen, kGen) { (as, bs, k) =>
      val ab = fill(as, k); ab.mergeFrom(fill(bs, k))
      val ba = fill(bs, k); ba.mergeFrom(fill(as, k))
      val expect = refTopK(as ++ bs, k)
      Prop(ab.sorted.toList == expect) :| "a<-b" &&
        Prop(ba.sorted.toList == expect) :| "b<-a"
    }

  property("serialize/deserialize round-trips through the aggregate's codec") =
    forAll(streamGen, kGen) { (xs, k) =>
      val agg = graft.functions.TopK.TopKByScore(
        org.apache.spark.sql.catalyst.expressions.Literal(0.0),
        org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
      val back = agg.deserialize(agg.serialize(fill(xs, k)))
      back.sorted.toList == refTopK(xs, k)
    }

  property("bloom filter kernel: no false negatives, constant-folded bytes") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { keys =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(keys.size.toLong, 0.01)
      keys.foreach(bf.putLong)
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
      val expr = graft.functions.HashExpressions.BloomMightContainLong(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.LongType, nullable = false),
        bos.toByteArray)
      keys.forall { key =>
        expr.eval(org.apache.spark.sql.catalyst.InternalRow(key))
          .asInstanceOf[Boolean]
      }
    }
}
