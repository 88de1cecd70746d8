package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: the mergeable frequent-items sketch
  * (Agarwal et al., "Mergeable Summaries", PODS'12) behind
  * approx-top-k in every warehouse engine. Re-expresses the reference's
  * "top merchants / top pages by volume" dashboards without an exact
  * token-grain groupBy when only the head of the distribution matters.
  *
  * Guarantees with capacity m over N observed items (after any sequence of
  * updates AND merges): every reported estimate satisfies
  * `f(x) - errBound <= est(x) <= f(x)` where errBound ≤ N/(m+1), and every
  * item with true frequency > errBound is IN the summary. When the distinct
  * count never exceeds m, no decrements happen and counts are exact.
  *
  * Scale shape: the buffer is O(m) regardless of input size or distinct
  * cardinality — it rides Spark's partial-aggregation machinery like any
  * built-in aggregate (map-side partials, one merge per partition at the
  * exchange), so a 100 TB scan produces a bounded per-task state and a
  * tiny shuffle. That is the entire point vs. the exact
  * `groupBy(item).count().orderBy.limit(k)`, whose shuffle is vocab-sized.
  */
final class MGSummary(val capacity: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
  /** Decrement mass removed so far — the additive error upper bound. */
  var errBound: Long = 0L
  /** Total non-null items observed (diagnostic; rides merges). */
  var total: Long = 0L

  def add(item: UTF8String): Unit = {
    total += 1L
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1L)
      case None if counts.size < capacity =>
        // clone: the UTF8String points into a reused row buffer
        counts.update(item.clone(), 1L)
      case None =>
        // classic MG step: the new item and every counter give up 1
        errBound += 1L
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.keysIterator.foreach { k =>
          val c = counts(k) - 1L
          if (c == 0L) dead += k else counts.update(k, c)
        }
        dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries MG merge: add counters, then if over capacity
    * subtract the (m+1)-th largest count from everything and drop the
    * non-positive — error bounds add along with the subtracted mass. */
  def mergeIn(other: MGSummary): MGSummary = {
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    total += other.total
    errBound += other.errBound
    if (counts.size > capacity) {
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      errBound += cut
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.keysIterator.foreach { k =>
        val c = counts(k) - cut
        if (c <= 0L) dead += k else counts.update(k, c)
      }
      dead.foreach(counts.remove)
    }
    this
  }
}

/** `topk_freq(item, capacity, k)` — top-k items by estimated frequency
  * from a capacity-m Misra–Gries summary, as
  * array<struct<item, count_est, err_bound>> sorted by estimate desc then
  * item asc (deterministic given deterministic partial summaries). */
case class TopKFreq(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"topk_freq needs 0 < k <= capacity, got k=$k capacity=$capacity")

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary =
    buffer.mergeIn(other)

  override def eval(buffer: MGSummary): Any = {
    val top: Array[Any] = buffer.counts.toArray
      .sortWith { case ((i1, c1), (i2, c2)) =>
        c1 > c2 || (c1 == c2 && i1.compareTo(i2) < 0)
      }
      .take(k)
      .map { case (item, c) =>
        val row = new GenericInternalRow(3)
        row.update(0, item)
        row.setLong(1, c)
        row.setLong(2, buffer.errBound)
        row: Any
      }
    new GenericArrayData(top)
  }

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.errBound)
    out.writeLong(buffer.total)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val s = new MGSummary(in.readInt())
    s.errBound = in.readLong()
    s.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      s.counts.update(UTF8String.fromBytes(bytes), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKFreq =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_est", LongType),
    StructField("err_bound", LongType))), containsNull = false)
  override def prettyName: String = "topk_freq"
}
