package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType

/** Static eval kernels for the custom expressions. Scala emits static
  * forwarders for object methods, so generated whole-stage code calls
  * `graft.functions.ExprHelpers.simhash64(arr)` directly — the
  * expressions stay inside codegen spans (no CodegenFallback iterator
  * break) while the loops remain compiled Scala.
  */
object ExprHelpers {

  def simhash64(arr: ArrayData): Long = {
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
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

  def rollingHash(arr: ArrayData): Long = {
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < arr.numElements()) {
      val t = if (arr.isNullAt(i)) 0L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 7L)
      h = h * 31L + t
      i += 1
    }
    h
  }

  /** Modular polynomial hash over the UTF-8 bytes of a string:
    * h = fold(h * 131 + byte) mod (2^31 - 1). Every intermediate fits in
    * 63 bits, so the identical fold is expressible in DuckDB BIGINT
    * arithmetic — this is the oracle-checkable fingerprint (the xxhash64
    * prints are JVM-specific and are pinned by ScalaTest specs instead). */
  def modPolyHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131L + (bytes(i) & 0xFFL)) % 2147483647L
      i += 1
    }
    h
  }

  /** Per-token modular polynomial hash with a selectable base — the same
    * fold as [[modPolyHash]] (mod 2^31-1 over UTF-8 bytes) but
    * base-parameterized so two independent 31-bit hashes can be combined
    * into a wider signature. */
  def polyTokenHash(s: org.apache.spark.unsafe.types.UTF8String, base: Long): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xFFL)) % 2147483647L
      i += 1
    }
    h
  }

  /** Oracle-portable SimHash: per token TWO 31-bit modular polynomial
    * hashes (bases 131 and 137) supply vote bits 0..30 and 31..61; bits
    * 62-63 stay 0 in every signature (a shared constant, so hamming
    * distances are unaffected). Every arithmetic step is a BIGINT-safe
    * fold DuckDB can replay bit-for-bit — this is the variant the oracle
    * gate checks end-to-end; [[simhash64]] (xxhash64 votes, full 64
    * bits) remains the production default. */
  def simhash64Poly(arr: ArrayData): Long = {
    val tally = new Array[Int](62)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = polyTokenHash(s, 131L)
        val h2 = polyTokenHash(s, 137L)
        var j = 0
        while (j < 31) {
          if (((h1 >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
          if (((h2 >>> j) & 1L) == 1L) tally(j + 31) += 1 else tally(j + 31) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 62) { if (tally(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** |A ∩ B| for two SORTED, DISTINCT string arrays via a single merge
    * pass — no hash set, no allocation. Element order must be
    * array_sort's (UTF8String binary order). The Jaccard denominator is
    * then |A| + |B| - |A ∩ B|, bit-identical to
    * size(array_union(a, b)) on distinct inputs. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def minhashSig(arr: ArrayData, k: Int, shingleN: Int): ArrayData = {
    val nTok = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokHash(i) =
        if (arr.isNullAt(i)) 0L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
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
    new GenericArrayData(sig)
  }

  /** PQ codes of a float vector: per subspace j, the codeword index
    * minimizing ||x_j − c||² via the (norm² − 2·dot, code) argmin (ties
    * → smaller code) — the eval kernel of `PqCodes`. Arithmetic and
    * comparison order replicate the struct-array/array_min SQL form
    * this replaced (Double.compare total order), so codes — and every
    * downstream ADC score — are unchanged. `norms(j)(c)` is the
    * driver-precomputed ||c||² (same left-fold sum as the literal the
    * old form embedded). */
  def pqEncodeCodes(q: ArrayData, books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]], dsub: Int): ArrayData = {
    val m = books.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val avail = math.max(0, q.numElements() - base)
      var bestC = 0
      var bestD = 0.0
      var c = 0
      while (c < books(j).length) {
        val cw = books(j)(c)
        val n = math.min(math.min(dsub, avail), cw.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += q.getFloat(base + i).toDouble * cw(i); i += 1 }
        val d = norms(j)(c) - 2.0 * dot
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; bestC = c // ties keep the earlier (smaller) code
        }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** RESIDUAL PQ codes — the eval kernel of `PqCodesResidual`: encode
    * (x − centroid(cell)) against residual-trained codebooks, the
    * standard FAISS IVFPQ form. Residuals to the assigned coarse
    * centroid carry far less variance than raw vectors, so the same
    * m/ksub bit budget quantizes finer; same (norm² − 2·dot, code)
    * argmin and tie order as [[pqEncodeCodes]]. */
  def pqEncodeCodesResidual(q: ArrayData, cell: Int,
      centroids: Array[Array[Double]], books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]], dsub: Int): ArrayData = {
    val cent = centroids(cell)
    val m = books.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val avail =
        math.max(0, math.min(q.numElements(), cent.length) - base)
      var bestC = 0
      var bestD = 0.0
      var c = 0
      while (c < books(j).length) {
        val cw = books(j)(c)
        val n = math.min(math.min(dsub, avail), cw.length)
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += (q.getFloat(base + i).toDouble - cent(base + i)) * cw(i)
          i += 1
        }
        val d = norms(j)(c) - 2.0 * dot
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; bestC = c // ties keep the earlier (smaller) code
        }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** dot(vector, centroids[cell]) — the eval kernel of `CentroidDot`
    * (the residual-IVFPQ ADC bias term). */
  def centroidDot(q: ArrayData, cell: Int,
      centroids: Array[Array[Double]]): Double = {
    val cent = centroids(cell)
    val n = math.min(q.numElements(), cent.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += q.getFloat(i).toDouble * cent(i); i += 1 }
    dot
  }

  /** Driver-side nearest-cell argmax over a plain float vector — the
    * training-time twin of [[nearestCells]] (same −2·dot ordering and
    * smaller-cell tie-break), used to form residual training samples;
    * the two MUST agree or codebooks train on residuals to a different
    * cell than the one encoding assigns. */
  def nearestCellIdx(v: Array[Float], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(v.length, cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v(i).toDouble * cent(i); i += 1 }
      val d = -2.0 * dot
      if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Per-query ADC lookup table lut[j][c] = dot(query subvector j,
    * codeword c) — the eval kernel of `PqLut`; dot semantics identical
    * to the sliced DotProduct form it replaced. */
  def pqQueryLut(q: ArrayData, books: Array[Array[Array[Double]]],
      dsub: Int): ArrayData = {
    val m = books.length
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val avail = math.max(0, q.numElements() - base)
      val ksub = books(j).length
      val lut = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        val cw = books(j)(c)
        val n = math.min(math.min(dsub, avail), cw.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += q.getFloat(base + i).toDouble * cw(i); i += 1 }
        lut(c) = dot
        c += 1
      }
      rows(j) = new GenericArrayData(lut)
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Σ_j lut[j][codes[j]] — the eval kernel of `AdcLutSum` (the ADC
    * candidate-scoring hot path). Left-associative add in ascending j,
    * exactly the fold the chained element_at(element_at(lut, j+1),
    * codes[j]+1) reduce it replaces produced, so every ADC score (and
    * the shortlist it ranks) is bit-identical. One pass over the two
    * ArrayData buffers instead of m re-reads of the outer array with
    * per-element dispatch — this runs once per (candidate, probe) row,
    * the O(corpus·nProbe) term of PQ serving. */
  def adcLutSum(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  /** The seed id of max cosine similarity (ties → smaller seed id) —
    * the eval kernel of `ArgmaxCosineSeed`, semDedup's narrow
    * assignment. Cosine is computed EXACTLY like `CosineSimilarity`
    * (min-length sequential fold, 0.0 on a zero norm) and the
    * comparison is `Double.compare` then seed id — byte-identical to
    * the crossJoin + max_by(struct(cos, -seed_id)) form it replaces,
    * which is what the small-k equality spec pins. Caller guarantees a
    * non-empty quantizer. */
  def argmaxCosineSeed(q: ArrayData, ids: Array[Long],
      embs: Array[Array[Float]]): Long = {
    var bestId = 0L
    var bestC = 0.0
    var s = 0
    while (s < embs.length) {
      val e = embs(s)
      val n = math.min(q.numElements(), e.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = q.getFloat(i).toDouble; val y = e(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val c = if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp = if (s == 0) 1 else java.lang.Double.compare(c, bestC)
      if (cmp > 0 || (cmp == 0 && ids(s) < bestId)) { bestC = c; bestId = ids(s) }
      s += 1
    }
    bestId
  }

  /** The nProbe nearest centroid cells of a float query vector, ordered
    * by (−2·dot, cell) ascending — the eval kernel of `NearestCells`.
    * The dot runs over min(len) in index order and the comparison is
    * `Double.compare` then cell id, byte-identical to the
    * (negsim, cell) struct `array_sort` SQL form this replaced (so IVF
    * results are unchanged). Selection is O(k·nProbe) over plan-time
    * constants (k ≤ thousands, nProbe ≤ tens) — no allocation beyond
    * the output. */
  def nearestCells(q: ArrayData, centroids: Array[Array[Double]],
      nProbe: Int): ArrayData = {
    // nProbe <= 0 would silently return zero cells — every probe scan
    // would match nothing and an IVF query would return an empty result
    // that looks like "no neighbors" instead of a misconfiguration
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val k = centroids.length
    val neg = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val n = math.min(q.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += q.getFloat(i).toDouble * cent(i); i += 1 }
      neg(c) = -2.0 * dot
      c += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) &&
            (best < 0 || java.lang.Double.compare(neg(c2), neg(best)) < 0))
          best = c2 // ties keep the earlier (smaller) cell id
        c2 += 1
      }
      taken(best) = true; out(s) = best; s += 1
    }
    new GenericArrayData(out)
  }

  /** Position of cell (x, y) on the order-`bits` Hilbert curve over the
    * 2^bits × 2^bits grid — the classic xy2d quadrant-rotation walk
    * (public algorithm). Eval kernel of `graft.ops.HilbertIndex`;
    * inputs are pre-bucketed to [0, 2^bits). */
  def hilbertIndex(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0; var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate the quadrant
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
