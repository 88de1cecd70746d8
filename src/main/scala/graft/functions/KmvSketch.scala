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

/** KMV (k-minimum-values) distinct-value sketch — the theta-sketch family
  * estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07; the DataSketches theta sketch is
  * the production descendant). Keeps the k smallest 64-bit hashes of the
  * values seen; the k-th smallest hash, read as a fraction u of the hash
  * space, estimates the distinct count as (k-1)/u.
  *
  * Why this exists next to HLL (gold/Sketches.scala): HLL unions, but it
  * CANNOT intersect — audience-overlap questions ("purchasers who also
  * hit errors") have no HLL answer. A KMV sketch is a uniform sample of
  * the distinct-value space, so set operations compose: the k smallest of
  * A∪B are computable from the two sketches alone, and the fraction of
  * that union sample present in both sketches estimates the Jaccard
  * similarity — intersection ≈ Jaccard × |A∪B|. [[Kmv]] builds those
  * estimates from codegen'd array functions over the sketch arrays.
  *
  * Scale shape: the buffer is O(k) longs regardless of input size; it
  * rides Spark's partial-aggregation machinery (map-side partials, one
  * merge per partition at the exchange), so a 100 TB scan shuffles only
  * fixed-size states. Seedless xxhash64 keeps sketches deterministic and
  * mergeable across queries and runs — persisting them in gold and
  * re-aggregating along any dimension works exactly like the HLL rollup.
  */
final class KmvBuffer(val k: Int) {
  /** The k smallest (signed-ordered) hashes seen, deduplicated. Signed
    * order is consistent with the fraction mapping u = h/2^64 + 1/2,
    * which is monotone in the signed value — "smallest" means the same
    * thing to the buffer and to the estimator. */
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h < set.last && set.add(h)) { set.remove(set.last); () }

  def mergeIn(other: KmvBuffer): KmvBuffer = {
    other.set.forEach(h => add(h))
    this
  }

  def toSortedArray: GenericArrayData = {
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

object KmvBuffer {
  def write(buffer: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.set.size)
    buffer.set.forEach(h => out.writeLong(h))
    out.flush()
    bos.toByteArray
  }

  def read(storageFormat: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val b = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.set.add(in.readLong()); i += 1 }
    b
  }
}

/** `kmv_sketch(value, k)` — the sketch as array<long> of the k smallest
  * hashes, ascending. Nulls are skipped (SQL aggregate convention). */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, s"kmv_sketch needs k > 1, got k=$k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer =
    buffer.mergeIn(other)

  override def eval(buffer: KmvBuffer): Any = buffer.toSortedArray

  override def serialize(buffer: KmvBuffer): Array[Byte] = KmvBuffer.write(buffer)
  override def deserialize(storageFormat: Array[Byte]): KmvBuffer =
    KmvBuffer.read(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"
}

/** `kmv_merge_agg(sketch, k)` — merge STORED kmv_sketch arrays (the
  * hll_union_agg analog): input rows are array<long> sketches whose
  * hashes feed the buffer directly, no re-hashing. This is what makes
  * persisting sketches in gold worthwhile: any coarser grouping — daily
  * sketches to a total, per-type to all-type — is a merge of fixed-size
  * states, never a rescan of the fact table. */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, s"kmv_merge_agg needs k > 1, got k=$k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buffer.add(arr.getLong(i)); i += 1 }
    }
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer =
    buffer.mergeIn(other)

  override def eval(buffer: KmvBuffer): Any = buffer.toSortedArray

  override def serialize(buffer: KmvBuffer): Array[Byte] = KmvBuffer.write(buffer)
  override def deserialize(storageFormat: Array[Byte]): KmvBuffer =
    KmvBuffer.read(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_merge_agg"
}

/** Estimators over kmv_sketch arrays — pure Spark array functions, so the
  * whole estimate pipeline stays inside whole-stage codegen; only the
  * bounded-state aggregate above needed a custom expression. */
object Kmv {

  private val TwoPow64 = 1.8446744073709552e19

  /** Signed hash h as a fraction of the hash space, in (0, 1). */
  private def frac(h: Column): Column =
    h.cast("double") / TwoPow64 + lit(0.5)

  /** Distinct-count estimate. A sketch that never filled IS the distinct
    * hash set, so the answer is exact below k. */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / frac(element_at(sketch, k)))

  /** The sketch of A∪B from the two sketches alone: k smallest of the
    * merged hash sets (the KMV closure property). */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(unionSketch(a, b, k), k)

  /** Jaccard estimate: fraction of the union's k-min sample found in BOTH
    * input sketches (the union sample is uniform over distinct values of
    * A∪B, so membership-in-both is a Bernoulli draw of J). */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column =
    size(array_intersect(unionSketch(a, b, k), array_intersect(a, b)))
      .cast("double") /
      greatest(size(unionSketch(a, b, k)), lit(1)).cast("double")

  /** Intersection cardinality ≈ J(A,B) × |A∪B| — the estimate HLL cannot
    * produce. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column =
    jaccardEstimate(a, b, k) * unionEstimate(a, b, k)

  /** Set-difference cardinality |A \ B| ≈ |A∪B| − |B| (inclusion–
    * exclusion over the same union sample) — the "A but not B" audience
    * estimate, floored at 0 since both terms carry independent sampling
    * error. */
  def differenceEstimate(a: Column, b: Column, k: Int): Column =
    greatest(unionEstimate(a, b, k) - estimate(b, k), lit(0.0))
}
