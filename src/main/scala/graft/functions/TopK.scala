package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a real AGGREGATE, not a window.
  *
  * `row_number() OVER (PARTITION BY qid ORDER BY sim DESC)` forces
  * every scored candidate row to shuffle into |queries| partitions and
  * sort there — one task per query sorting ALL its candidates. With
  * 10 queries over 10⁹ vectors that is 10 tasks sorting 10⁹ rows each:
  * the classic top-k scale failure. This aggregate is the two-phase
  * form: each input partition folds its rows into a k-bounded heap
  * (map-side partial aggregation — Spark plans TypedImperativeAggregate
  * through ObjectHashAggregate with a partial/final split), and the
  * shuffle then carries AT MOST k entries per (partition, query)
  * instead of the full candidate set. The final merge is k-sized.
  *
  * Ordering contract (must match the former window): sim DESC, then
  * id ASC — ties broken toward the smaller id, bit-identical to the
  * DuckDB oracle's `ORDER BY sim DESC, nid`.
  */
object TopK {

  /** Min-heap over the KEPT entries: head is the worst — the entry
    * the next better candidate evicts. "Worse" = lower sim, or equal
    * sim and larger id. NaN scores are REJECTED at insertion: an
    * undefined similarity (e.g. cosine of a zero-norm vector) must
    * never occupy — let alone poison — a top-k slot. (Naive `>`
    * comparisons against a NaN head are always false, which would
    * permanently freeze the heap; scores are compared totally via
    * Double.compare and NaN simply never enters.) */
  final class TopKBuffer(val k: Int) {
    private val ord: Ordering[(Double, Long)] =
      Ordering.by { case (sim, id) => (-sim, id) } // max of ord = worst
    val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

    def add(sim: Double, id: Long): Unit = {
      if (sim.isNaN) return
      if (heap.size < k) heap.enqueue((sim, id))
      else {
        val (wSim, wId) = heap.head
        val c = java.lang.Double.compare(sim, wSim)
        if (c > 0 || (c == 0 && id < wId)) {
          heap.dequeue(); heap.enqueue((sim, id))
        }
      }
    }

    def mergeFrom(other: TopKBuffer): Unit =
      other.heap.foreach { case (s, i) => add(s, i) }

    /** Best-first: sim DESC, id ASC. */
    def sorted: Array[(Double, Long)] =
      heap.clone().dequeueAll.reverse.toArray
  }

  /** top_k_by_score(score, id, k) → array<struct<nid, sim>> best-first. */
  case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {
    require(k > 0, s"top_k_by_score needs k > 0, got $k")

    override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
    override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("nid", LongType, nullable = false),
        StructField("sim", DoubleType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = scoreExpr.eval(input)
      val i = idExpr.eval(input)
      if (s != null && i != null)
        buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
      buf
    }

    override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: TopKBuffer): Any =
      new GenericArrayData(buf.sorted.map { case (sim, id) =>
        InternalRow(id, sim)
      }.toArray[Any])

    override def serialize(buf: TopKBuffer): Array[Byte] = {
      val entries = buf.sorted
      val bb = ByteBuffer.allocate(4 + entries.length * 16)
      bb.putInt(entries.length)
      entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new TopKBuffer(k)
      var j = 0
      while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKByScore =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKByScore =
      copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
    override def prettyName: String = "top_k_by_score"
  }
}
