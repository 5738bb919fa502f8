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
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = hash64(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (tally(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  private def hash64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, 42L)

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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokHash(i) =
        if (arr.isNullAt(i)) 0L
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val nShingles = math.max(1, nTok - shingleN + 1)
    var s = 0
    while (s < nShingles) {
      var sh = 0L
      var j = 0
      val w = math.min(shingleN, nTok - s)
      while (j < w) { sh = sh * 0x100000001b3L + tokHash(s + j); j += 1 }
      val h0 = mix(sh)
      val h1 = mix(sh ^ 0x5851f42d4c957f2dL) | 1L
      var h = h0
      var q = 0
      while (q < k) {
        if (h < sig(q)) sig(q) = h
        h += h1
        q += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Polynomial rolling hash over tokens (document fingerprinting). */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < arr.numElements()) {
      val t = if (arr.isNullAt(i)) 0L
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          arr.getUTF8String(i), StringType, 7L)
      h = h * 31L + t
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column wrappers. */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression => expr}

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expr(a), expr(b)))
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expr(a), expr(b)))
  def simhash64(tokens: Column): Column = column(SimHash64(expr(tokens)))
  def rolling_hash(tokens: Column): Column = column(RollingHash(expr(tokens)))
  def minhash_sig(tokens: Column, k: Int, shingleN: Int = 3): Column =
    column(MinHashSignature(expr(tokens), k, shingleN))
}
