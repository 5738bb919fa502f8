package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup operators
  * (SURVEY.md §2.D). These sit in the per-row hot path of 100 TB scans,
  * so they are real `Expression`s with `doGenCode` (whole-stage-codegen
  * friendly), not Scala UDFs: no boxing, no Row conversion, direct
  * `ArrayData` access.
  */

/** Cosine similarity of two float vectors; 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of a float vector with a constant double vector (the
  * random hyperplanes of SRP-LSH are plan-time constants). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array of string tokens: per-token 64-bit hash
  * votes on each bit; the sign of the per-bit tally forms the signature.
  * Near-duplicate docs differ in few bits (compare via bit_count(a^b)).
  * Interpreted eval (CodegenFallback) — the hash loop dominates, codegen
  * would buy little here.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprHelpers.simhash64($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Oracle-portable SimHash over an array of string tokens: two 31-bit
  * modular polynomial hashes per token vote on bits 0..61 (see
  * ExprHelpers.simhash64Poly). DuckDB replays the identical fold, so
  * signatures — and therefore the hamming-join pair set — are
  * cross-engine checkable. */
case class SimHash64Poly(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.simhash64Poly(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprHelpers.simhash64Poly($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over token n-gram shingles, in one pass over the
  * TOKEN array — no shingle strings are ever built. Per token one
  * xxhash64; shingle identity is a positional-polynomial combination of
  * n consecutive token hashes; k hash functions derive from two mixes of
  * the shingle hash via h_i = h0 + i*h1 (Kirsch-Mitzenmacher). Cost:
  * O(|tokens|) hashing + O(k*|tokens|) arithmetic, zero allocation
  * beyond the k-long signature. This is the shape that matters when the
  * input is 100 TB of documents.
  */
case class MinHashSignature(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.minhashSig(v.asInstanceOf[ArrayData], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprHelpers.minhashSig($a, $k, $shingleN)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Modular polynomial hash over a string's UTF-8 bytes — the
  * oracle-portable fingerprint (mod 2^31-1 keeps every intermediate in
  * BIGINT range, so DuckDB can replay the fold bit-for-bit). */
case class ModPolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.modPolyHash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprHelpers.modPolyHash($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Polynomial rolling hash over tokens (document fingerprinting). */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.rollingHash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprHelpers.rollingHash($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The nProbe nearest IVF cells of a float query vector by descending
  * dot-product similarity against a PLAN-TIME centroid matrix (ties →
  * smaller cell id). Replaces the parsed SQL fragment that embedded the
  * matrix as ~kClusters×dim literal doubles: that string cost ~0.2 s of
  * driver parse+analysis PER EXECUTION at 16×64, while here the matrix
  * rides along as a codegen reference object and the expression tree
  * stays O(1). Per-row work is one compiled loop instead of kClusters
  * struct allocations + array_sort; ordering is byte-identical to the
  * (negsim, cell) struct array_sort it replaced (Double.compare total
  * order on −2·dot, then cell ascending), so IVF results are unchanged.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression {
  // plan-time, fails loud once: nProbe <= 0 would otherwise surface as a
  // NegativeArraySizeException deep inside the codegen'd eval kernel
  require(nProbe >= 1, s"NearestCells: nProbe must be >= 1, got $nProbe")
  require(centroids.nonEmpty, "NearestCells: empty centroid table")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.nearestCells(v.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprHelpers.nearestCells($a, $ref, $nProbe)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The quantizer-seed id of maximum cosine similarity (ties → smaller
  * seed id) against a PLAN-TIME seed set — semDedup's assignment as ONE
  * narrow per-row expression. The crossJoin + max_by form this offers
  * an alternative to materializes n×k intermediate rows and partially
  * aggregates them back down; at the SemDeDup paper's k ~ √n that
  * dominates assignment cost. Here the seed matrix rides along as a
  * codegen reference object and each row costs one compiled argmax
  * loop. Cosine values and tie-breaks are byte-identical to the join
  * form (spec-pinned at small k). */
case class ArgmaxCosineSeed(child: Expression, seedIds: Array[Long],
    seedEmbs: Array[Array[Float]]) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.argmaxCosineSeed(v.asInstanceOf[ArrayData], seedIds, seedEmbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("seedIds", seedIds, "long[]")
    val embs = ctx.addReferenceObj("seedEmbs", seedEmbs, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprHelpers.argmaxCosineSeed($a, $ids, $embs)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ codes of a float vector against PLAN-TIME codebooks (see
  * ExprHelpers.pqEncodeCodes): one compiled per-row loop instead of
  * m×ksub struct expressions with literal codeword arrays — the same
  * driver-side plan-cost fix as NearestCells, applied to the PQ encode
  * path. Codes are byte-identical to the struct-min form. */
case class PqCodes(child: Expression, books: Array[Array[Array[Double]]],
    dsub: Int) extends UnaryExpression {
  // ||c||² per codeword, precomputed once with the same left-fold sum
  // the literal form embedded at plan time
  private lazy val norms: Array[Array[Double]] =
    books.map(_.map(_.map(x => x * x).sum))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.pqEncodeCodes(v.asInstanceOf[ArrayData], books, norms, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "double[][][]")
    val n = ctx.addReferenceObj("norms", norms, "double[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprHelpers.pqEncodeCodes($a, $b, $n, $dsub)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** RESIDUAL PQ codes of a float vector against PLAN-TIME codebooks and
  * coarse centroids (see ExprHelpers.pqEncodeCodesResidual): encodes
  * (x − centroid(cell)), the standard FAISS IVFPQ form — residuals to
  * the assigned cell carry far less variance than raw vectors, so the
  * same code budget quantizes finer and the composed index reaches the
  * same recall at lower nProbe/rerank. Matrices ride along as codegen
  * reference objects (the NearestCells plan-cost discipline). */
case class PqCodesResidual(emb: Expression, cell: Expression,
    centroids: Array[Array[Double]], books: Array[Array[Array[Double]]],
    dsub: Int) extends BinaryExpression {
  override def left: Expression = emb
  override def right: Expression = cell
  // ||c||² per residual codeword, precomputed once (same left-fold sum
  // as PqCodes)
  private lazy val norms: Array[Array[Double]] =
    books.map(_.map(_.map(x => x * x).sum))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, c: Any): Any =
    ExprHelpers.pqEncodeCodesResidual(v.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], centroids, books, norms, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val b = ctx.addReferenceObj("books", books, "double[][][]")
    val n = ctx.addReferenceObj("norms", norms, "double[][]")
    defineCodeGen(ctx, ev, (a, c) =>
      s"graft.functions.ExprHelpers.pqEncodeCodesResidual($a, $c, $cents, $b, $n, $dsub)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(emb = l, cell = r)
}

/** dot(vector, centroids[cell]) against a PLAN-TIME centroid matrix —
  * the residual-IVFPQ per-(query, cell) ADC bias term as ONE narrow
  * expression instead of a join against a centroid table (with tiny
  * probe frames the extra join stage costs more than the arithmetic). */
case class CentroidDot(emb: Expression, cell: Expression,
    centroids: Array[Array[Double]]) extends BinaryExpression {
  override def left: Expression = emb
  override def right: Expression = cell
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any, c: Any): Any =
    ExprHelpers.centroidDot(v.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, (a, c) =>
      s"graft.functions.ExprHelpers.centroidDot($a, $c, $cents)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(emb = l, cell = r)
}

/** Per-query ADC lookup table against PLAN-TIME codebooks (see
  * ExprHelpers.pqQueryLut) — replaces m×ksub sliced-dot literal
  * expressions with one compiled loop; values unchanged. */
case class PqLut(child: Expression, books: Array[Array[Array[Double]]],
    dsub: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.pqQueryLut(v.asInstanceOf[ArrayData], books, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ExprHelpers.pqQueryLut($a, $b, $dsub)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Σ_j lut[j][codes[j]] — the PQ ADC score's table-lookup sum as ONE
  * compiled pass (see ExprHelpers.adcLutSum). Replaces the m-term
  * element_at(element_at(lut, j+1), codes[j]+1) reduce chain, which
  * re-read the outer array and dispatched per element on every of the
  * O(corpus·nProbe) candidate rows — the measured hot task of the PQ
  * serving stage. Values are bit-identical (same left-assoc fold). */
case class AdcLutSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprHelpers.adcLutSum(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprHelpers.adcLutSum($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Merge-based |A ∩ B| over sorted distinct string arrays (the
  * all-pairs Jaccard hot path — replaces hash-based array_intersect +
  * array_union with one allocation-free pass). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprHelpers.sortedIntersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprHelpers.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column wrappers. */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression => expr}

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expr(a), expr(b)))
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expr(a), expr(b)))
  def simhash64(tokens: Column): Column = column(SimHash64(expr(tokens)))
  def simhash64_poly(tokens: Column): Column = column(SimHash64Poly(expr(tokens)))
  def rolling_hash(tokens: Column): Column = column(RollingHash(expr(tokens)))
  def mod_poly_hash(text: Column): Column = column(ModPolyHash(expr(text)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expr(a), expr(b)))
  def minhash_sig(tokens: Column, k: Int, shingleN: Int = 3): Column =
    column(MinHashSignature(expr(tokens), k, shingleN))
  def nearest_cells(q: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    column(NearestCells(expr(q), centroids, nProbe))
  def argmax_cosine_seed(q: Column, seedIds: Array[Long],
      seedEmbs: Array[Array[Float]]): Column =
    column(ArgmaxCosineSeed(expr(q), seedIds, seedEmbs))
  def pq_codes(q: Column, books: Array[Array[Array[Double]]], dsub: Int): Column =
    column(PqCodes(expr(q), books, dsub))
  def pq_codes_residual(q: Column, cell: Column,
      centroids: Array[Array[Double]], books: Array[Array[Array[Double]]],
      dsub: Int): Column =
    column(PqCodesResidual(expr(q), expr(cell), centroids, books, dsub))
  def centroid_dot(q: Column, cell: Column,
      centroids: Array[Array[Double]]): Column =
    column(CentroidDot(expr(q), expr(cell), centroids))
  def pq_lut(q: Column, books: Array[Array[Array[Double]]], dsub: Int): Column =
    column(PqLut(expr(q), books, dsub))
  def adc_lut_sum(lut: Column, codes: Column): Column =
    column(AdcLutSum(expr(lut), expr(codes)))

  /** Bounded top-k-by-(sim desc, id asc) aggregate (TopKAgg.scala):
    * the map-side-pre-reduced replacement for a row_number window. */
  def top_k_by_sim(id: Column, sim: Column, k: Int): Column =
    column(TopKSimAgg(expr(id), expr(sim), k).toAggregateExpression())

  // KMV theta-style distinct sketch (KmvSketch.scala)
  def kmv_sketch(c: Column, k: Int): Column =
    column(KmvSketchAgg(expr(c), k).toAggregateExpression())
  def kmv_estimate(sketch: Column, k: Int): Column =
    column(KmvEstimate(expr(sketch), k))
  def kmv_merge(a: Column, b: Column, k: Int): Column =
    column(KmvMerge(expr(a), expr(b), k))
  def kmv_intersect_estimate(a: Column, b: Column, k: Int): Column =
    column(KmvIntersectEstimate(expr(a), expr(b), k))
}
