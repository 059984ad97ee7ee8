package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch — the bottom-k /
  * Theta-sketch family (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07; Apache
  * DataSketches' theta sketch is the production descendant).
  *
  * `kmv_longs_agg(hash, k)` keeps the k smallest DISTINCT hash values
  * seen, returned ascending. With hashes uniform on [0, 2^b), the
  * k-th smallest value h_k estimates the distinct count as
  * `(k-1) * 2^b / h_k`; fewer than k distinct values means the sketch
  * IS the exact distinct set. Unlike HLL, every register is an exact
  * integer — both the registers and the estimate are deterministic
  * functions of the input SET, so a DuckDB oracle can restate them
  * verbatim (`list_sort(list(DISTINCT h))[:k]`) and a hash match
  * certifies the whole sketch state, not a tolerance band.
  *
  * Scale shape: this is the two-phase form of count-distinct. A plain
  * `countDistinct(x) GROUP BY g` shuffles every distinct (g, x) pair;
  * this aggregate's map-side partial folds each input partition into
  * a k-bounded sorted set, so the exchange carries AT MOST k longs per
  * (partition, group) whatever the data volume. The merge is the same
  * fold — KMV is a monoid (union-then-truncate), so sketches built
  * per shard, per day, or per stream micro-batch re-aggregate into
  * exact whole-population sketches: the k global minima each survive
  * their own shard's top-k.
  *
  * Duplicate hashes are deduplicated at insertion (a TreeSet, not a
  * heap): KMV's estimator is defined over the distinct hash SET, and
  * a duplicate-admitting buffer would silently bias the estimate low.
  */
object Kmv {

  /** Sorted distinct min-k buffer. Insert O(log k); never exceeds k. */
  final class KmvBuffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()

    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (h < set.last) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }

    def mergeFrom(other: KmvBuffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedArray: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** kmv_longs_agg(hash, k) → array<long>: the k smallest distinct
    * hashes, ascending. */
  case class KmvLongsAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {
    require(k > 0, s"kmv_longs_agg needs k > 0, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def nullable: Boolean = false
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: KmvBuffer): Any =
      new GenericArrayData(buf.sortedArray)

    override def serialize(buf: KmvBuffer): Array[Byte] = {
      val entries = buf.sortedArray
      val bb = ByteBuffer.allocate(4 + entries.length * 8)
      bb.putInt(entries.length)
      entries.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): KmvBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new KmvBuffer(k)
      var j = 0
      while (j < n) { buf.add(bb.getLong); j += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvLongsAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvLongsAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): KmvLongsAgg =
      copy(child = newChildren(0))
    override def prettyName: String = "kmv_longs_agg"
  }
}
