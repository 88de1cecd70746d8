package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded bottom-k state: the k smallest (priority, payload) pairs seen
  * so far, kept in a size-capped max-heap (the largest retained pair pops
  * first, so a smaller candidate evicts it in O(log k)).
  *
  * This is a true mergeable summary (Agarwal et al., PODS'12 sense):
  * update and merge both preserve "the k smallest of everything observed",
  * so any update/merge tree over any partitioning yields the SAME final
  * state — the aggregate is deterministic and order-independent, which is
  * what lets it ride Spark's partial aggregation (map-side combine, one
  * bounded buffer per group per task, ≤ k pairs per group crossing the
  * exchange).
  */
final class BottomKState(val k: Int) {
  // max-first ordering: compare priorities bytewise, tie-break on payload
  private val ord: Ordering[(UTF8String, Long)] =
    new Ordering[(UTF8String, Long)] {
      def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = a._1.compareTo(b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
  val heap: mutable.PriorityQueue[(UTF8String, Long)] =
    mutable.PriorityQueue.empty[(UTF8String, Long)](ord)

  def add(pri: UTF8String, payload: Long): Unit =
    if (heap.size < k) {
      // clone: the UTF8String points into a reused row buffer
      heap.enqueue((pri.clone(), payload))
    } else if (ord.lt((pri, payload), heap.head)) {
      heap.dequeue()
      heap.enqueue((pri.clone(), payload))
    }

  def mergeIn(other: BottomKState): BottomKState = {
    // other's pairs are already cloned (they were added on another task)
    other.heap.foreach { case (p, v) =>
      if (heap.size < k) heap.enqueue((p, v))
      else if (ord.lt((p, v), heap.head)) { heap.dequeue(); heap.enqueue((p, v)) }
    }
    this
  }

  /** Ascending (priority, payload) — the deterministic sample order. */
  def sorted: Array[(UTF8String, Long)] = heap.clone().dequeueAll.toArray.reverse
}

/** `bottomk_sample(priority, payload, k)` — the k pairs of smallest
  * (priority, payload) per group, as array<struct<pri: string,
  * payload: bigint>> sorted ascending. Null priorities/payloads are
  * skipped.
  *
  * With `priority = md5(cast(payload as string))` this is EXACT uniform
  * sampling without replacement per group — and engine-portable (md5 is
  * identical everywhere), so unlike xxhash64-based sampling it is
  * DuckDB-oracle-checkable. It computes in ONE aggregation pass what
  * ScalableRank.topKPerGroup computes in two window passes: the window
  * path shuffles every row of every group; this path shuffles at most
  * k pairs per group per upstream task. At 100 TB group-grain sampling
  * (per-language, per-domain, per-day quotas), that is the difference
  * between an exchange sized by the corpus and one sized by
  * groups × k.
  */
case class BottomKSample(
    priority: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKState] with BinaryLike[Expression]
  with ExpectsInputTypes {

  require(k > 0, s"bottomk_sample needs k > 0, got $k")

  // analysis-time typing: the SQL builder inserts implicit casts, but a
  // directly-constructed expression with non-string/non-long children must
  // fail analysis, not throw ClassCastException inside update()
  override def inputTypes = Seq(StringType, LongType)

  override def left: Expression = priority
  override def right: Expression = payload

  override def createAggregationBuffer(): BottomKState = new BottomKState(k)

  override def update(buffer: BottomKState, input: InternalRow): BottomKState = {
    val p = priority.eval(input)
    val v = payload.eval(input)
    if (p != null && v != null)
      buffer.add(p.asInstanceOf[UTF8String], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BottomKState, other: BottomKState): BottomKState =
    buffer.mergeIn(other)

  override def eval(buffer: BottomKState): Any =
    new GenericArrayData(buffer.sorted.map { case (p, v) =>
      val row = new GenericInternalRow(2)
      row.update(0, p)
      row.setLong(1, v)
      row: Any
    })

  override def serialize(buffer: BottomKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buffer.sorted
    out.writeInt(buffer.k)
    out.writeInt(items.length)
    items.foreach { case (p, v) =>
      val bytes = p.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BottomKState = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val s = new BottomKState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      s.heap.enqueue((UTF8String.fromBytes(bytes), in.readLong()))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(priority = newLeft, payload = newRight)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pri", StringType),
    StructField("payload", LongType))), containsNull = false)
  override def prettyName: String = "bottomk_sample"
}
