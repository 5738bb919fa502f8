package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve position of pre-bucketed (x, y) — a compiled Catalyst
  * expression (whole-stage-codegen'd via the static kernel) because the
  * xy2d quadrant-rotation walk is iterative state, not renderable
  * shift/or algebra like the Morton key. See [[Layout.hilbertValue]]. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62, s"HilbertIndex: bits $bits out of range")
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(x: Any, y: Any): Any =
    graft.functions.ExprHelpers.hilbertIndex(
      x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ExprHelpers.hilbertIndex($x, $y, $bits)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * The 100 TB problem this solves: a table sorted by one column prunes
  * file-level min/max stats on THAT column only — a predicate on any
  * other dimension scans everything. Interleaving the bits of several
  * dimensions into one sort key (the Z-curve) keeps every interleaved
  * dimension's span tight within each output file, so parquet
  * row-group/file stats prune on ALL of them. This is the layout
  * `OPTIMIZE ... ZORDER BY` computes in lakehouse engines; the reference
  * engine inherits only single-index order from its storage handler
  * (`ha_binlog_table::rnd_next` scans in log order, binlog_table_reader
  * .cc:163-214), so multi-dimensional layout is exactly the kind of
  * capability a Spark re-expression adds for free at write time.
  *
  * Everything here is integer arithmetic over fixed [lo, hi] dimension
  * ranges — `bucket = ((x - lo) * 2^bits) div (hi - lo + 1)`, bits
  * interleaved dimension-major — so the DuckDB oracle recomputes the
  * identical key from the identical SQL formula ([[zValueSql]] renders
  * it in either dialect). Range-normalization against known bounds is
  * one narrow projection: no shuffle, no sampling pass, codegen'd
  * end-to-end (plain shift/and/or `Column` algebra — stays inside
  * WholeStageCodegen). The write path then needs ONE range exchange on
  * the z-key, the same exchange any global sort pays.
  *
  * A quantile variant (sample → broadcast boundaries → narrow bucket
  * assign) handles skewed dimensions at the same shuffle cost but its
  * boundaries are engine-internal, so correctness is pinned by the
  * fixed-range form's oracle plus the layout invariants in the spec.
  */
object Layout {

  /** One z-ordered dimension: column name + closed value bounds.
    * Values outside [lo, hi] clamp into the edge buckets (stats stay
    * correct; pruning just degrades for outliers). */
  final case class Dim(name: String, lo: Long, hi: Long) {
    require(hi >= lo, s"$name: hi $hi < lo $lo")
  }

  /** The Morton key: bit i of dimension j lands at position i*n + j.
    * Renders the one shared SQL formula ([[zValueSql]]) — shift/and/or
    * over exact integral-division buckets, fully codegen'd. */
  def zValue(dims: Seq[Dim], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits >= 1 && bits * dims.length <= 63,
      s"bits ($bits) * dims (${dims.length}) must fit a signed 64-bit key")
    expr(zValueSql(dims, bits, duck = false))
  }

  /** The same key as a SQL string for the given dialect — the oracle
    * twin of [[zValue]], built from one formula so the two cannot
    * drift. `duck = true` renders DuckDB's `//` integral division,
    * false renders Spark SQL's `div`. */
  /** One dimension's bucket in [0, 2^bits) as SQL — exact integral
    * arithmetic, rendered for either dialect. */
  def bucketSql(d: Dim, bits: Int, duck: Boolean): String = {
    val divOp = if (duck) "//" else "div"
    val span = d.hi - d.lo + 1
    // CAST once: keeps the multiply in 64-bit space for int columns
    val clamped =
      s"GREATEST(${d.lo}, LEAST(${d.hi}, CAST(${d.name} AS BIGINT)))"
    s"((($clamped - ${d.lo}) * ${1L << bits}) $divOp $span)"
  }

  def zValueSql(dims: Seq[Dim], bits: Int, duck: Boolean): String = {
    val n = dims.length
    val buckets = dims.map(bucketSql(_, bits, duck))
    val terms = for {
      i <- 0 until bits
      j <- 0 until n
    } yield s"((((${buckets(j)} >> $i) & 1)) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Cluster `df` on the z-curve over `dims`: one range exchange on the
    * interleaved key, sorted within partitions so every output file's
    * min/max stats are tight on EVERY dimension. `numFiles` is the
    * target file count (at 100 TB: total bytes / target file size).
    * The z-key column is kept under `keyCol` for stats/debugging;
    * callers drop it before writing if undesired. */
  def zOrderBy(df: DataFrame, dims: Seq[Dim], bits: Int, numFiles: Int,
      keyCol: String = "__z"): DataFrame = {
    require(!df.columns.map(_.toLowerCase).contains(keyCol.toLowerCase),
      s"column '$keyCol' already exists; pass a different keyCol")
    df.withColumn(keyCol, zValue(dims, bits))
      .repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
  }

  // ------------------------------------------------------- Hilbert curve

  /** Hilbert-curve position over two dimensions: same bucket
    * normalization as [[zValue]], but the curve has NO diagonal jumps —
    * consecutive positions are always grid neighbors, so per-file spans
    * are tighter than Z-order's at quadrant transitions. The quadrant-
    * rotation walk is iterative state, not shift/or algebra, so this is
    * a compiled Catalyst expression ([[HilbertIndex]]) rather than a
    * rendered formula; the q78 oracle recomputes it in DuckDB as a
    * recursive CTE over the identical public algorithm — two
    * independent implementations, one hash. */
  def hilbertValue(dimX: Dim, dimY: Dim, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bits ($bits) out of range")
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(HilbertIndex(
      expression(expr(bucketSql(dimX, bits, duck = false))),
      expression(expr(bucketSql(dimY, bits, duck = false))), bits))
  }

  /** [[zOrderBy]]'s Hilbert twin: one range exchange on the curve key. */
  def hilbertOrderBy(df: DataFrame, dimX: Dim, dimY: Dim, bits: Int,
      numFiles: Int, keyCol: String = "__h"): DataFrame = {
    require(!df.columns.map(_.toLowerCase).contains(keyCol.toLowerCase),
      s"column '$keyCol' already exists; pass a different keyCol")
    df.withColumn(keyCol, hilbertValue(dimX, dimY, bits))
      .repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
  }

  /** The q78 oracle: the same xy2d walk as a DuckDB recursive CTE —
    * `bits` unrolled generations over pre-bucketed (x, y), emitting
    * `d` when the side length reaches zero. `inner` supplies the
    * FROM-able row source with key columns `keys` plus x/y buckets. */
  def hilbertSqlDuck(dimX: Dim, dimY: Dim, bits: Int, keys: Seq[String],
      table: String): String = {
    val n = 1L << bits
    val ks = keys.mkString(", ")
    s"""WITH RECURSIVE pts AS (
       |  SELECT $ks,
       |    ${bucketSql(dimX, bits, duck = true)} AS x,
       |    ${bucketSql(dimY, bits, duck = true)} AS y
       |  FROM $table
       |), walk AS (
       |  SELECT $ks, x, y, CAST(${n / 2} AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
       |  FROM pts
       |  UNION ALL
       |  SELECT $ks,
       |    CASE WHEN (y & s) = 0 THEN
       |      CASE WHEN (x & s) > 0 THEN ${n - 1} - y ELSE y END
       |    ELSE x END AS x,
       |    CASE WHEN (y & s) = 0 THEN
       |      CASE WHEN (x & s) > 0 THEN ${n - 1} - x ELSE x END
       |    ELSE y END AS y,
       |    s // 2 AS s,
       |    d + s * s * xor(CASE WHEN (x & s) > 0 THEN 3 ELSE 0 END,
       |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END) AS d
       |  FROM walk WHERE s > 0
       |)
       |SELECT $ks, d AS h FROM walk WHERE s = 0""".stripMargin
  }

  /** Reference scalar implementation for the spec: interleave the given
    * pre-bucketed coordinates bit by bit. */
  private[graft] def interleaveRef(buckets: Array[Long], bits: Int): Long = {
    var z = 0L
    val n = buckets.length
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        z |= ((buckets(j) >> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    z
  }
}
