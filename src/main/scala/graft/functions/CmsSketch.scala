package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
  * Summary: The Count-Min Sketch and its Applications", J. Algorithms'05)
  * — the mergeable POINT-FREQUENCY estimator that completes graft's sketch
  * shelf: HLL answers "how many distinct", KMV answers "how much overlap",
  * Misra–Gries answers "which items are the head", and CMS answers "how
  * often does THIS item occur" for any item, including ones far outside
  * the top-k a Misra–Gries summary can retain.
  *
  * Layout: depth×width long counters, flattened row-major into one
  * array<long>. Each row d has an independent hash; an update increments
  * one counter per row, and a point estimate is the MIN over the depth
  * counters the item maps to. Estimates never undercount (every counter
  * the item touches holds its true count plus non-negative collision
  * mass); with total mass N, `est ≤ f + e·N/width` with probability
  * ≥ 1 − e^−depth per query.
  *
  * Hash contract (the reason estimates need NO custom expression): row
  * d's hash of value v is exactly Spark's built-in `xxhash64(v, d)`
  * (seed-chained: hash(d, INT, hash(v, type, 42))). A sketch persisted in
  * a gold table is therefore probed by pure codegen'd array/hash
  * built-ins — [[Cms.pointEstimate]] — with no graft registration needed
  * at read time, the same stored-sketch contract as [[Kmv]].
  *
  * Scale shape: O(depth·width) state per task regardless of input size or
  * cardinality, riding Spark's partial-aggregation machinery (map-side
  * partials, one elementwise-add merge per partition at the exchange).
  * Seedless hashing keeps sketches deterministic and mergeable across
  * queries, days, and runs.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)
  /** Total mass N (non-null updates; rides merges) — the error-bound
    * numerator, returned as the first element of the eval array. */
  var total: Long = 0L

  def bucket(h: Long): Int = {
    val m = (h % width).toInt
    if (m < 0) m + width else m
  }

  def mergeIn(other: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
    total += other.total
    this
  }
}

object CmsBuffer {
  def write(buffer: CmsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.depth)
    out.writeInt(buffer.width)
    out.writeLong(buffer.total)
    var i = 0
    while (i < buffer.counters.length) { out.writeLong(buffer.counters(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  def read(storageFormat: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val b = new CmsBuffer(in.readInt(), in.readInt())
    b.total = in.readLong()
    var i = 0
    while (i < b.counters.length) { b.counters(i) = in.readLong(); i += 1 }
    b
  }

  /** eval layout: [total, c(0,0) … c(0,w−1), c(1,0) … c(depth−1,w−1)] —
    * the total rides inside the array so a stored sketch carries its own
    * error-bound numerator. */
  def toArrayData(buffer: CmsBuffer): GenericArrayData = {
    val out = new Array[Long](1 + buffer.counters.length)
    out(0) = buffer.total
    System.arraycopy(buffer.counters, 0, out, 1, buffer.counters.length)
    new GenericArrayData(out)
  }
}

/** `cms_sketch(value, depth, width)` — the sketch as array<long>
  * `[total, counters…]`. Nulls are skipped (SQL aggregate convention). */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression] {

  require(depth > 0 && width > 1,
    s"cms_sketch needs depth > 0 and width > 1, got depth=$depth width=$width")

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buffer.total += 1L
      // identical to the built-in xxhash64(v, d): children seed-chain
      val h0 = XxHash64Function.hash(v, child.dataType, 42L)
      var d = 0
      while (d < depth) {
        val hd = XxHash64Function.hash(d, IntegerType, h0)
        buffer.counters(d * width + buffer.bucket(hd)) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer =
    buffer.mergeIn(other)

  override def eval(buffer: CmsBuffer): Any = CmsBuffer.toArrayData(buffer)

  override def serialize(buffer: CmsBuffer): Array[Byte] = CmsBuffer.write(buffer)
  override def deserialize(storageFormat: Array[Byte]): CmsBuffer =
    CmsBuffer.read(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"
}

/** `cms_merge_agg(sketch, depth, width)` — merge STORED cms_sketch arrays
  * by elementwise addition (totals included): daily sketches roll up to a
  * period total as fixed-size state adds, never a fact rescan — the same
  * stored-sketch re-aggregation contract as [[KmvMergeAgg]]. */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression] {

  require(depth > 0 && width > 1,
    s"cms_merge_agg needs depth > 0 and width > 1, got depth=$depth width=$width")

  private val expectedLen = 1 + depth * width

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == expectedLen,
        s"cms_merge_agg: stored sketch has ${arr.numElements()} elements, " +
          s"expected $expectedLen for depth=$depth width=$width")
      buffer.total += arr.getLong(0)
      var i = 0
      while (i < depth * width) {
        buffer.counters(i) += arr.getLong(i + 1)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer =
    buffer.mergeIn(other)

  override def eval(buffer: CmsBuffer): Any = CmsBuffer.toArrayData(buffer)

  override def serialize(buffer: CmsBuffer): Array[Byte] = CmsBuffer.write(buffer)
  override def deserialize(storageFormat: Array[Byte]): CmsBuffer =
    CmsBuffer.read(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_merge_agg"
}

/** Estimators over cms_sketch arrays — pure Spark built-ins (xxhash64 +
  * element_at + least), so probing a stored sketch stays inside
  * whole-stage codegen and needs no graft function registration. */
object Cms {

  /** Counter (d, pmod(xxhash64(item, d), width)) — 1-based into the eval
    * array, skipping the leading total slot. */
  private def counterAt(sketch: Column, item: Column, d: Int, width: Int): Column =
    element_at(sketch,
      (lit(d * width + 1 + 1) + pmod(xxhash64(item, lit(d)), lit(width))).cast("int"))

  /** Point-frequency estimate: min over the depth counters the item maps
    * to. Never undercounts; overcounts by at most e·N/width w.h.p. */
  def pointEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    least((0 until depth).map(d => counterAt(sketch, item, d, width)): _*)

  /** Total mass N the sketch observed (the error-bound numerator). */
  def totalMass(sketch: Column): Column = element_at(sketch, 1)

  /** The e·N/width additive error ceiling that holds per probe with
    * probability ≥ 1 − e^−depth. */
  def errorCeiling(sketch: Column, width: Int): Column =
    totalMass(sketch).cast("double") * math.E / width
}
