package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  def zValueSql(dims: Seq[Dim], bits: Int, duck: Boolean): String = {
    val n = dims.length
    val divOp = if (duck) "//" else "div"
    val buckets = dims.map { d =>
      val span = d.hi - d.lo + 1
      // CAST once: keeps the multiply in 64-bit space for int columns
      val clamped =
        s"GREATEST(${d.lo}, LEAST(${d.hi}, CAST(${d.name} AS BIGINT)))"
      s"((($clamped - ${d.lo}) * ${1L << bits}) $divOp $span)"
    }
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
