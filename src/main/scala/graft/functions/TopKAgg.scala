package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k by (sim DESC, id ASC) as a native aggregate —
  * the pre-reduced form of `row_number() OVER (PARTITION BY group ORDER
  * BY sim DESC, id)` + `rank <= k`. The window form shuffles EVERY
  * scored candidate row to its group's reducer and sorts them just to
  * keep k; as a TypedImperativeAggregate this runs partial aggregation
  * map-side, so the exchange carries at most k (id, sim) pairs per group
  * per map partition — the O(corpus·nProbe) → O(k·queries·partitions)
  * shuffle reduction the ANN serve paths need at 100 TB.
  *
  * Ordering is byte-identical to the window it replaces:
  *   - descending sim under `java.lang.Double.compare` total order —
  *     the same total order Spark's SortOrder uses for doubles (NaN
  *     greatest; -0.0 never reaches the comparator distinct from 0.0
  *     because UnsafeRow writers normalize it);
  *   - ties by ascending id;
  *   - null sims LAST (the Spark default for DESC), among themselves by
  *     ascending id — they fill k-slots only when fewer than k non-null
  *     candidates exist in the group.
  * Output is the ordered array of (neighbor_id, sim) structs; position
  * i is rank i+1, so callers recover the exact window output with one
  * posexplode.
  */
case class TopKSimAgg(
    id: Expression,
    sim: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSimBuffer]
  with BinaryLike[Expression] {

  require(k >= 1, s"top_k_by_sim needs k >= 1, got $k")

  override def left: Expression = id
  override def right: Expression = sim
  // analysis-time type gate (AbstractDataType/ExpectsInputTypes is
  // private[sql], so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && sim.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_sim expects (bigint, double) input, got " +
        s"(${id.dataType.catalogString}, ${sim.dataType.catalogString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_sim"

  override def createAggregationBuffer(): TopKSimBuffer = new TopKSimBuffer(k)

  override def update(buffer: TopKSimBuffer, input: InternalRow): TopKSimBuffer = {
    val idV = id.eval(input)
    // a null id cannot reach the serve paths (the self-pair filter
    // already drops null-id rows), but a window would sort it FIRST
    // among equal sims (ASC nulls first) — refusing loud beats silently
    // diverging from the window if a future caller feeds one
    require(idV != null, "top_k_by_sim: null id")
    val simV = sim.eval(input)
    if (simV == null) buffer.addNullSim(idV.asInstanceOf[Long])
    else buffer.add(idV.asInstanceOf[Long], simV.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKSimBuffer, other: TopKSimBuffer): TopKSimBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: TopKSimBuffer): Any = {
    val (ids, sims, n, nullIds, nNullOut) = buffer.ordered
    val rows = new Array[Any](n + nNullOut)
    var i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(Array[Any](ids(i), sims(i)))
      i += 1
    }
    var j = 0
    while (j < nNullOut) {
      rows(n + j) = new GenericInternalRow(Array[Any](nullIds(j), null))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKSimBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKSimBuffer =
    TopKSimBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKSimAgg =
    copy(id = l, sim = r)
}

/** k-bounded buffer sorted by (sim DESC via Double.compare, id ASC).
  * Parallel primitive arrays, binary-search insert with arraycopy shift:
  * once full, a candidate no better than the current worst costs one
  * comparison and no allocation — the common case on a big scan. Null
  * sims keep their own k-bounded ascending-id array (they can only fill
  * slots the non-null side leaves empty, so k of them suffice). */
final class TopKSimBuffer(val k: Int) {
  private var ids = new Array[Long](math.min(k, 16))
  private var sims = new Array[Double](math.min(k, 16))
  private var n = 0
  private var nullIds: Array[Long] = null
  private var nNull = 0

  /** a-before-b in the output order? (sim desc, id asc) */
  private def before(simA: Double, idA: Long, simB: Double, idB: Long): Boolean = {
    val c = java.lang.Double.compare(simA, simB)
    if (c != 0) c > 0 else idA < idB
  }

  def add(id: Long, sim: Double): Unit = {
    if (n == k && !before(sim, id, sims(n - 1), ids(n - 1))) return
    // binary search for the insertion point in the (sim desc, id asc) order
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(sims(mid), ids(mid), sim, id)) lo = mid + 1 else hi = mid
    }
    if (n == ids.length && n < k) {
      val grow = math.min(k, math.max(4, ids.length * 2))
      ids = java.util.Arrays.copyOf(ids, grow)
      sims = java.util.Arrays.copyOf(sims, grow)
    }
    val last = math.min(n, k - 1) // the k-th entry (if any) falls off
    System.arraycopy(ids, lo, ids, lo + 1, last - lo)
    System.arraycopy(sims, lo, sims, lo + 1, last - lo)
    ids(lo) = id; sims(lo) = sim
    if (n < k) n += 1
  }

  def addNullSim(id: Long): Unit = {
    if (nullIds == null) nullIds = new Array[Long](math.min(k, 16))
    if (nNull == k && id >= nullIds(nNull - 1)) return
    var lo = 0; var hi = nNull
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (nullIds(mid) < id) lo = mid + 1 else hi = mid
    }
    if (nNull == nullIds.length && nNull < k)
      nullIds = java.util.Arrays.copyOf(nullIds,
        math.min(k, math.max(4, nullIds.length * 2)))
    val last = math.min(nNull, k - 1)
    System.arraycopy(nullIds, lo, nullIds, lo + 1, last - lo)
    nullIds(lo) = id
    if (nNull < k) nNull += 1
  }

  def mergeFrom(other: TopKSimBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.ids(i), other.sims(i)); i += 1 }
    var j = 0
    while (j < other.nNull) { addNullSim(other.nullIds(j)); j += 1 }
  }

  /** (ids, sims, nNonNull, nullIds, nNullEmitted): the ordered top-k —
    * null-sim ids only fill the slots the non-null side leaves free. */
  def ordered: (Array[Long], Array[Double], Int, Array[Long], Int) =
    (ids, sims, n, nullIds, math.min(nNull, k - n))

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + n * 16 + nNull * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); bb.putDouble(sims(i)); i += 1 }
    bb.putInt(nNull)
    var j = 0
    while (j < nNull) { bb.putLong(nullIds(j)); j += 1 }
    bb.array()
  }
}

object TopKSimBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKSimBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKSimBuffer(k)
    val n = bb.getInt
    var i = 0
    // entries were serialized in (sim desc, id asc) order, so re-adding
    // preserves the order directly (each lands at the end)
    while (i < n) {
      val id = bb.getLong; val sim = bb.getDouble
      buf.add(id, sim); i += 1
    }
    val nNull = bb.getInt
    var j = 0
    while (j < nNull) { buf.addNullSim(bb.getLong); j += 1 }
    buf
  }
}
