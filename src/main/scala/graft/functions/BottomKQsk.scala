package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k quantile-sketch state: the k smallest
  * (priority, key, value) triples seen so far, in a size-capped max-heap
  * (largest retained triple pops first, so a smaller candidate evicts it
  * in O(log k)). The struct-payload sibling of [[BottomKState]], carrying
  * the (pri, key, v) rows a [[graft.gold.QuantileSketch]] state is made
  * of. Mergeable summary: update and merge both preserve "the k smallest
  * of everything observed", so any update/merge tree over any
  * partitioning yields the same final state — which is what lets it ride
  * partial aggregation (≤ k triples per group per map task cross the
  * exchange).
  */
final class BottomKQskState(val k: Int) {
  // max-first: order by (pri, key, v) — the same lexicographic struct
  // order sort_array gives the (pri, key, v) struct, so eval() reproduces
  // the stored-sketch array bit for bit.
  private val ord: Ordering[(Long, Long, Double)] =
    new Ordering[(Long, Long, Double)] {
      def compare(a: (Long, Long, Double), b: (Long, Long, Double)): Int = {
        val c1 = java.lang.Long.compare(a._1, b._1)
        if (c1 != 0) return c1
        val c2 = java.lang.Long.compare(a._2, b._2)
        if (c2 != 0) return c2
        java.lang.Double.compare(a._3, b._3)
      }
    }
  val heap: mutable.PriorityQueue[(Long, Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Long, Double)](ord)

  def add(pri: Long, key: Long, v: Double): Unit = {
    val t = (pri, key, v)
    if (heap.size < k) heap.enqueue(t)
    else if (ord.lt(t, heap.head)) { heap.dequeue(); heap.enqueue(t) }
  }

  def mergeIn(other: BottomKQskState): BottomKQskState = {
    other.heap.foreach { t =>
      if (heap.size < k) heap.enqueue(t)
      else if (ord.lt(t, heap.head)) { heap.dequeue(); heap.enqueue(t) }
    }
    this
  }

  /** Ascending (pri, key, v) — the sketch's stored order. */
  def sorted: Array[(Long, Long, Double)] = heap.clone().dequeueAll.toArray.reverse
}

/** `bottomk_qsk(pri, key, v, k)` — the k smallest (pri, key, v) triples
  * per group as array<struct<_pri: bigint, _key: bigint, _v: double>>
  * sorted ascending: the quantile-sketch state of
  * [[graft.gold.QuantileSketch]] built in ONE partial-agged aggregation.
  *
  * The two-phase window path it replaces (ScalableRank.topKPerGroup +
  * collect_list/sort_array + a separate count aggregate joined back) costs
  * two window funnels and three exchanges over every raw row; this path
  * shuffles at most k triples per group per upstream task and shares its
  * exchange with the `n_rows` count in the same agg — at 100 TB the
  * difference between corpus-sized exchanges and a groups×k one.
  * Rows with a NULL in any input are skipped (callers exclude NULL values
  * up front; the guard here keeps the aggregate total).
  */
case class BottomKQsk(
    pri: Expression,
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKQskState] with TernaryLike[Expression]
  with ExpectsInputTypes {

  require(k > 0, s"bottomk_qsk needs k > 0, got $k")

  // analysis-time typing (no ascription: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType, LongType, DoubleType)

  override def first: Expression = pri
  override def second: Expression = key
  override def third: Expression = value

  override def createAggregationBuffer(): BottomKQskState = new BottomKQskState(k)

  override def update(buffer: BottomKQskState, input: InternalRow): BottomKQskState = {
    val p = pri.eval(input)
    val ky = key.eval(input)
    val v = value.eval(input)
    if (p != null && ky != null && v != null)
      buffer.add(p.asInstanceOf[Long], ky.asInstanceOf[Long],
        v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: BottomKQskState, other: BottomKQskState): BottomKQskState =
    buffer.mergeIn(other)

  override def eval(buffer: BottomKQskState): Any =
    new GenericArrayData(buffer.sorted.map { case (p, ky, v) =>
      val row = new GenericInternalRow(3)
      row.setLong(0, p)
      row.setLong(1, ky)
      row.setDouble(2, v)
      row: Any
    })

  override def serialize(buffer: BottomKQskState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buffer.sorted
    out.writeInt(buffer.k)
    out.writeInt(items.length)
    items.foreach { case (p, ky, v) =>
      out.writeLong(p); out.writeLong(ky); out.writeDouble(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BottomKQskState = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val s = new BottomKQskState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      s.heap.enqueue((in.readLong(), in.readLong(), in.readDouble()))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKQsk =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKQsk =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BottomKQsk =
    copy(pri = newFirst, key = newSecond, value = newThird)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_pri", LongType, nullable = false),
    StructField("_key", LongType, nullable = false),
    StructField("_v", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "bottomk_qsk"
}
