package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV ("k minimum values", the theta-sketch family) distinct-count
  * sketch: keep the k smallest 64-bit hashes seen; the k-th smallest
  * normalized hash R estimates distinct = (k-1)/R. What it buys over
  * Spark's built-in HLL (`approx_count_distinct`):
  *
  *   - sketches SUPPORT SET OPERATIONS: union = merge the value lists;
  *     intersection via the ratio of shared values inside the union's
  *     k-minimum set (HLL cannot intersect without inclusion-exclusion
  *     blowup across many sets);
  *   - the sketch is a plain sorted array column — storable in a table,
  *     re-aggregable across days/partitions, inspectable.
  *
  * 100 TB posture: the buffer is O(k) longs regardless of input size,
  * partial aggregation runs map-side (TypedImperativeAggregate gives
  * partial/final for free), and merges are linear in k. Standard error
  * ~ 1/sqrt(k-2): k=1024 → ~3%.
  *
  * Reference-independent extension (SURVEY §2.D posture): the reference
  * delegates aggregation wholesale to its SQL layer; mergeable sketches
  * are the Spark-native scale path for distinct questions over CDC keys.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(KmvSketchAgg.hashValue(v))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(buffer.sortedValues)

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  val Seed = 42L

  /** 64-bit hash of a scalar value (xxhash64 kernels; type-directed like
    * Spark's own hash expressions). */
  def hashValue(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, Seed)
    case i: Int => XXH64.hashLong(i.toLong, Seed)
    case s: Short => XXH64.hashLong(s.toLong, Seed)
    case b: Byte => XXH64.hashLong(b.toLong, Seed)
    case b: Boolean => XXH64.hashLong(if (b) 1L else 0L, Seed)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), Seed)
    case f: Float => XXH64.hashLong(java.lang.Float.floatToIntBits(f).toLong, Seed)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    case other => throw new IllegalArgumentException(
      s"kmv_sketch: unsupported input type ${other.getClass.getName}")
  }
}

/** Bounded set of the k smallest distinct hashes, unsigned order.
  * TreeSet keeps insert/evict O(log k); k is small (hundreds..thousands). */
final class KmvBuffer(val k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0) {
      if (set.add(h)) set.pollLast()
      ()
    }
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Ascending unsigned order (the k-minimum set). */
  def sortedValues: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val vs = sortedValues
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }
}

object KmvBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

/** Static kernels shared by eval and codegen (same pattern as
  * ExprHelpers: codegen emits one static call, keeping whole-stage
  * codegen spans intact). */
object KmvKernels {

  /** Distinct estimate from a sketch: exact count while the sketch is
    * unsaturated, else (k-1)/R_k with R_k the k-th smallest hash
    * normalized to (0,1] by its top 53 bits. */
  def estimate(sketch: ArrayData, k: Int): Double = {
    val n = sketch.numElements()
    if (n < k) n.toDouble
    else {
      val rk = sketch.getLong(k - 1)
      // unsigned >>> 11 keeps the top 53 bits: exact in a double
      val norm = ((rk >>> 11) + 1L).toDouble / (1L << 53).toDouble
      (k - 1).toDouble / norm
    }
  }

  /** k smallest of the union of two ascending-unsigned sketches (one
    * merge pass, dedup on the fly). */
  def merge(a: ArrayData, b: ArrayData, k: Int): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Long](math.min(k, na + nb))
    var i = 0; var j = 0; var m = 0
    while (m < k && (i < na || j < nb)) {
      val take =
        if (i >= na) { val v = b.getLong(j); j += 1; v }
        else if (j >= nb) { val v = a.getLong(i); i += 1; v }
        else {
          val va = a.getLong(i); val vb = b.getLong(j)
          val c = java.lang.Long.compareUnsigned(va, vb)
          if (c <= 0) { i += 1; if (c == 0) j += 1; va }
          else { j += 1; vb }
        }
      if (m == 0 || out(m - 1) != take) { out(m) = take; m += 1 }
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }

  private def contains(sorted: ArrayData, h: Long): Boolean = {
    var lo = 0; var hi = sorted.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(sorted.getLong(mid), h)
      if (c == 0) return true
      if (c < 0) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  /** |A ∩ B| estimate: within the union's k-minimum set K, the fraction
    * of hashes present in BOTH sketches estimates the Jaccard
    * similarity; scale by the union estimate. */
  def intersectEstimate(a: ArrayData, b: ArrayData, k: Int): Double = {
    val u = merge(a, b, k)
    val n = u.numElements()
    if (n == 0) return 0.0
    var shared = 0; var i = 0
    while (i < n) {
      val h = u.getLong(i)
      if (contains(a, h) && contains(b, h)) shared += 1
      i += 1
    }
    shared.toDouble / n.toDouble * estimate(u, k)
  }
}

/** sketch -> estimated distinct count. */
case class KmvEstimate(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    KmvKernels.estimate(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvKernels.estimate($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (sketchA, sketchB) -> union sketch (re-aggregation across stored
  * sketches without touching raw data). */
case class KmvMerge(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvKernels.merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KmvKernels.merge($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** (sketchA, sketchB) -> estimated |A ∩ B| — the operation HLL can't do. */
case class KmvIntersectEstimate(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvKernels.intersectEstimate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.KmvKernels.intersectEstimate($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
