package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable AGGREGATE — the
  * candidate-generation half of sketch-guided exact heavy hitters.
  *
  * The naive heavy-hitter query `GROUP BY item HAVING count > N/k`
  * shuffles the FULL vocabulary: at 100 TB of n-gram streams that is
  * billions of distinct keys through the exchange to answer a question
  * whose result is at most k-1 rows. This aggregate bounds the state
  * instead: each input partition folds its items into a fixed
  * `capacity`-entry counter map (map-side partial aggregation —
  * Spark plans TypedImperativeAggregate through ObjectHashAggregate
  * with a partial/final split), so the shuffle carries AT MOST
  * `capacity` entries per partition and the final merge is
  * capacity-sized, independent of vocabulary.
  *
  * Guarantee (the classical one, and the reason the two-pass operator
  * built on top is EXACT, not approximate): after any sequence of
  * updates and merges totalling N items, every item with true
  * frequency > N/(capacity+1) is present in the sketch. Updates are
  * the textbook algorithm (Misra & Gries 1982, "Finding repeated
  * elements": increment if tracked, insert if space, else decrement
  * all); merges are the mergeable-summaries form (Agarwal et al.,
  * PODS 2012): sum counters, then subtract the (capacity+1)-th
  * largest count and drop non-positive entries — error stays additive
  * across merges, so the bound survives arbitrary partitioning and
  * merge trees.
  *
  * The candidate SET the sketch returns is partitioning-dependent
  * (which sub-threshold survivors remain depends on merge order); any
  * operator consuming it must therefore re-verify candidates exactly
  * — see [[graft.operators.TextAnalysis.heavyHitters]], whose second
  * exact pass makes the final answer deterministic and lets the
  * DuckDB hash oracle gate it.
  */
object MisraGries {

  /** Bounded counter map; at most `capacity` tracked items. */
  final class MgBuffer(val capacity: Int) {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

    /** One stream item: increment / insert / decrement-all. The
      * decrement branch touches `capacity` entries but destroys
      * `capacity` units of previously-inserted count, so total work
      * across a stream is O(N) — amortized O(1) per item. */
    def add(t: String): Unit = counts.get(t) match {
      case Some(c) => counts.update(t, c + 1L)
      case None if counts.size < capacity => counts.update(t, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (k, c) =>
          if (c == 1L) dead += k else counts.update(k, c - 1L)
        }
        dead.foreach(counts.remove)
    }

    /** Mergeable-summaries combine: sum, then shrink back to capacity
      * by subtracting the (capacity+1)-th largest count. Entries
      * strictly above it survive — at most `capacity` of them. */
    def mergeFrom(other: MgBuffer): Unit = {
      other.counts.foreach { case (k, c) =>
        counts.update(k, counts.getOrElse(k, 0L) + c)
      }
      if (counts.size > capacity) {
        val vals = counts.values.toArray
        java.util.Arrays.sort(vals)
        val sub = vals(vals.length - capacity - 1)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (k, c) =>
          if (c - sub <= 0L) dead += k else counts.update(k, c - sub)
        }
        dead.foreach(counts.remove)
      }
    }

    /** Tracked items, sorted — deterministic for a given set. */
    def sortedKeys: Array[String] = {
      val ks = counts.keysIterator.toArray
      java.util.Arrays.sort(ks, Ordering[String])
      ks
    }
  }

  /** misra_gries(item, capacity) → array<string>: the ≤capacity
    * candidate items whose superset-of-heavy-hitters guarantee is
    * documented on [[MisraGries]]. NULL items are skipped (a NULL
    * n-gram is absent, not a key). */
  case class MisraGriesTokens(child: Expression, capacity: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MgBuffer] with ImplicitCastInputTypes {
    require(capacity > 0, s"misra_gries needs capacity > 0, got $capacity")

    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

    override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
      buf
    }

    override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: MgBuffer): Any =
      new GenericArrayData(
        buf.sortedKeys.map(UTF8String.fromString).toArray[Any])

    override def serialize(buf: MgBuffer): Array[Byte] = {
      val entries = buf.counts.toArray
      val payloads = entries.map { case (k, _) =>
        k.getBytes(StandardCharsets.UTF_8)
      }
      val bb = ByteBuffer.allocate(
        4 + payloads.map(_.length + 12).sum)
      bb.putInt(entries.length)
      entries.indices.foreach { i =>
        bb.putInt(payloads(i).length)
        bb.put(payloads(i))
        bb.putLong(entries(i)._2)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): MgBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new MgBuffer(capacity)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val payload = new Array[Byte](len)
        bb.get(payload)
        buf.counts.update(
          new String(payload, StandardCharsets.UTF_8), bb.getLong)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesTokens =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesTokens =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MisraGriesTokens =
      copy(child = newChildren(0))
    override def prettyName: String = "misra_gries"
  }
}
