package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.MisraGries
import graft.functions.MisraGries.MgBuffer

/** Properties of the Misra–Gries buffer — the kernel under the
  * sketch-guided heavy-hitters operator. The operator's exactness
  * claim reduces to the superset guarantee: every item with true
  * frequency > N/(capacity+1) must survive the sketch, under ANY
  * partitioning of the stream and ANY merge tree, plus a lossless
  * shuffle codec. The generators skew the alphabet (few hot items,
  * long tail) so eviction pressure is real at the tiny capacities
  * under test. */
object MgProps extends Properties("MgBuffer") {

  // hot items collide often; the tail forces evictions
  private val itemGen: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("h0", "h1", "h2"),
    5 -> Gen.chooseNum(0, 400).map(i => s"t$i"))

  private val streamGen = Gen.listOf(itemGen)
  private val capGen = Gen.chooseNum(1, 8)

  private def fill(xs: Seq[String], cap: Int): MgBuffer = {
    val b = new MgBuffer(cap)
    xs.foreach(b.add)
    b
  }

  private def heavy(xs: List[String], cap: Int): Set[String] = {
    val n = xs.length
    xs.groupBy(identity).collect {
      case (k, g) if g.length.toLong * (cap + 1) > n => k
    }.toSet
  }

  property("single stream: every item above N/(cap+1) is retained") =
    forAll(streamGen, capGen) { (xs, cap) =>
      val kept = fill(xs, cap).counts.keySet
      heavy(xs, cap).subsetOf(kept)
    }

  property("single stream: counts never overcount, undercount <= N/(cap+1)") =
    forAll(streamGen, capGen) { (xs, cap) =>
      val truth = xs.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
      val bound = xs.length.toLong / (cap + 1)
      fill(xs, cap).counts.forall { case (k, c) =>
        val f = truth(k)
        c <= f && f - c <= bound
      }
    }

  property("chunked merge tree preserves the guarantee over the union") =
    forAll(streamGen, Gen.chooseNum(1, 6), capGen) { (xs, chunks, cap) =>
      val parts = xs.grouped(math.max(1, xs.length / chunks + 1)).toList
      val merged = parts match {
        case Nil => new MgBuffer(cap)
        case h :: t =>
          val acc = fill(h, cap)
          t.foreach(p => acc.mergeFrom(fill(p, cap)))
          acc
      }
      Prop(merged.counts.size <= cap) :| "bounded" &&
        Prop(heavy(xs, cap).subsetOf(merged.counts.keySet)) :| "superset"
    }

  property("merge never overcounts (exact-pass filter stays sound)") =
    forAll(streamGen, streamGen, capGen) { (as, bs, cap) =>
      val truth = (as ++ bs).groupBy(identity)
        .map { case (k, g) => k -> g.length.toLong }
      val m = fill(as, cap); m.mergeFrom(fill(bs, cap))
      m.counts.forall { case (k, c) => c <= truth(k) }
    }

  property("serialize/deserialize round-trips through the aggregate's codec") =
    forAll(streamGen, capGen) { (xs, cap) =>
      val agg = MisraGries.MisraGriesTokens(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), cap)
      val buf = fill(xs, cap)
      val back = agg.deserialize(agg.serialize(buf))
      back.counts == buf.counts
    }
}
